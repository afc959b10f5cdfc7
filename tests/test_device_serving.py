"""Device-side batched serving paths: DynamicIndex.knn over the cached
live-row matrix, DocumentStore.search_batch / knn_batch over the combined
store index — all oracle-checked."""

import numpy as np
import pytest

from vector_database_tpu import DocumentStore, DynamicIndex


def _oracle_knn(mat, ids, q, k, radius=None):
    d2 = np.sum((mat - q) ** 2, axis=1)
    order = np.argsort(d2, kind="stable")[:k]
    if radius is not None:
        order = order[d2[order] <= radius * radius]
    return set(np.asarray(ids)[order].tolist()), np.sort(d2[order])


def test_dynamic_knn_device_path_matches_oracle():
    rng = np.random.RandomState(0)
    vecs = rng.rand(500, 8).astype(np.float32) * 2 - 1
    idx = DynamicIndex(vecs)
    # mutate: deletions + pending delta rows
    idx.remove_ids(list(range(0, 50)))
    extra = rng.rand(30, 8).astype(np.float32) * 2 - 1
    new_ids = idx.add(extra)

    live_mat = np.concatenate([vecs[50:], extra])
    live_ids = np.concatenate([np.arange(50, 500), new_ids])
    qs = rng.rand(16, 8).astype(np.float32) * 2 - 1
    ids, d2 = idx.knn(qs, k=7)
    for qi in range(16):
        want, wd = _oracle_knn(live_mat, live_ids, qs[qi], 7)
        assert set(ids[qi].tolist()) == want
        assert np.allclose(np.sort(d2[qi]), wd, rtol=1e-4, atol=1e-5)


def test_dynamic_knn_radius_bound_and_empty():
    rng = np.random.RandomState(1)
    vecs = rng.rand(100, 4).astype(np.float32)
    idx = DynamicIndex(vecs)
    q = vecs[3]
    ids, d2 = idx.knn(q, k=5, radius=1e-6)
    assert ids[0, 0] == 3 and np.all(ids[0, 1:] == -1)
    empty = DynamicIndex()
    ids, d2 = empty.knn(np.zeros((2, 4), np.float32), k=3)
    assert ids.shape == (2, 3) and (ids == -1).all()


def test_dynamic_knn_k_exceeds_live_rows():
    vecs = np.eye(4, dtype=np.float32)
    idx = DynamicIndex(vecs)
    ids, d2 = idx.knn(np.zeros((1, 4), np.float32), k=10)
    assert ids.shape == (1, 10)
    assert set(i for i in ids[0].tolist() if i >= 0) == {0, 1, 2, 3}


def test_document_store_search_batch_oracle():
    rng = np.random.RandomState(2)
    store = DocumentStore(leaf_size=4)
    all_rows = []  # (doc, text, vec)
    for d in range(3):
        doc = store.create_document(f"doc{d}")
        for t in range(40):
            v = rng.rand(6).astype(np.float32) * 2 - 1
            tid = store.add_text(doc, v, f"t{d}.{t}")
            all_rows.append((doc, tid, v))
    qs = np.stack([r[2] for r in all_rows[:5]])
    got = store.search_batch(qs, 0.7)
    for qi in range(5):
        want = set(
            (doc, tid)
            for doc, tid, v in all_rows
            if float(np.sum((v - qs[qi]) ** 2)) <= 0.49
        )
        assert set((d, t) for d, t, _ in got[qi]) == want
        for d, t, dd in got[qi]:
            v = next(v for dd2, tt, v in all_rows
                     if dd2 == d and tt == t)
            assert abs(float(np.sum((v - qs[qi]) ** 2)) - dd) < 1e-5

    # doc-scoped
    got1 = store.search_batch(qs, 0.7, doc_id=1)
    for qi in range(5):
        assert all(d == 1 for d, _, _ in got1[qi])
        assert set((d, t) for d, t, _ in got1[qi]) == set(
            (d, t) for d, t, _ in got[qi] if d == 1
        )


def test_document_store_knn_batch_oracle():
    rng = np.random.RandomState(3)
    store = DocumentStore(leaf_size=4)
    all_rows = []
    for d in range(2):
        doc = store.create_document(f"doc{d}")
        for t in range(30):
            v = rng.rand(5).astype(np.float32)
            tid = store.add_text(doc, v)
            all_rows.append((doc, tid, v))
    mat = np.stack([r[2] for r in all_rows])
    qs = rng.rand(4, 5).astype(np.float32)
    docs, texts, d2 = store.knn_batch(qs, k=5)
    for qi in range(4):
        dd = np.sum((mat - qs[qi]) ** 2, axis=1)
        want = set(np.argsort(dd)[:5].tolist())
        got = set(
            i for i, (d, t, _) in enumerate(all_rows)
            if (d, t) in zip(docs[qi].tolist(), texts[qi].tolist())
        )
        # compare via (doc, text) pairs
        want_pairs = set(
            (all_rows[i][0], all_rows[i][1]) for i in want
        )
        got_pairs = set(zip(docs[qi].tolist(), texts[qi].tolist()))
        assert got_pairs == want_pairs

    # doc-scoped k-NN with k > doc rows
    docs, texts, d2 = store.knn_batch(qs, k=40, doc_id=2)
    for qi in range(4):
        valid = docs[qi] >= 0
        assert valid.sum() == 30
        assert (docs[qi][valid] == 2).all()


def test_document_store_cache_invalidation():
    store = DocumentStore(leaf_size=2)
    doc = store.create_document("a")
    store.add_text(doc, np.asarray([0.0, 0.0], np.float32), text_id=100)
    r1 = store.search_batch(np.zeros((1, 2), np.float32), 0.1)
    assert [(d, t) for d, t, _ in r1[0]] == [(doc, 100)]
    store.add_text(doc, np.asarray([0.01, 0.0], np.float32), text_id=101)
    r2 = store.search_batch(np.zeros((1, 2), np.float32), 0.1)
    assert set((d, t) for d, t, _ in r2[0]) == {(doc, 100), (doc, 101)}
    store.delete_document(doc)
    r3 = store.search_batch(np.zeros((1, 2), np.float32), 0.1)
    assert r3[0] == []
