"""Filtered k-NN (row allowlists) — the device-batched generalization of
the reference's Find predicate (MemoryVectorIndex.cs:237-241), validated
against a filtered brute-force oracle."""

import numpy as np

from vector_database_tpu import build_index, knn
from vector_database_tpu.ops.scan_knn import scan_knn
from vector_database_tpu.utils import datasets


def filtered_oracle(vecs, queries, mask, k):
    d2 = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    d2 = np.where(mask[None, :], d2, np.inf)
    pos = np.argsort(d2, axis=1)[:, :k]
    dd = np.take_along_axis(d2, pos, 1)
    return np.where(np.isfinite(dd), pos, -1), dd


def test_scan_knn_row_mask_exact():
    vecs = np.asarray(datasets.random_uniform(3000, 8, seed=180))
    queries = np.asarray(datasets.random_uniform(16, 8, seed=181))
    rng = np.random.RandomState(182)
    mask = rng.rand(3000) < 0.3
    want_r, want_d = filtered_oracle(vecs, queries, mask, 5)
    for precise in (True, False):
        rows, d2 = scan_knn(
            vecs, queries, k=5, precise=precise, row_mask=mask,
            block=1024,
        )
        rows, d2 = np.asarray(rows), np.asarray(d2)
        for i in range(16):
            assert set(rows[i].tolist()) == set(want_r[i].tolist()), (
                precise, i
            )
        np.testing.assert_allclose(
            np.sort(d2, 1), np.sort(want_d, 1), rtol=1e-4, atol=1e-6
        )
        # no masked row ever surfaces
        assert not np.isin(rows[rows >= 0], np.nonzero(~mask)[0]).any()


def test_scan_knn_highly_selective_mask():
    """A 0.3% allowlist with precise=True (the documented mode for
    sparse filters): the filter must ride the scan, not post-filter an
    unfiltered top-k (which would return almost nothing)."""
    vecs = np.asarray(datasets.random_uniform(4000, 6, seed=183))
    queries = np.asarray(datasets.random_uniform(4, 6, seed=184))
    mask = np.zeros(4000, bool)
    mask[[5, 1999, 3777]] = True
    rows, d2 = scan_knn(
        vecs, queries, k=3, row_mask=mask, block=512, precise=True
    )
    rows = np.asarray(rows)
    for i in range(4):
        assert set(rows[i].tolist()) == {5, 1999, 3777}


def test_scan_knn_mask_bucket_collision_precise():
    """Two allowed rows in the SAME (block, bucket) cell: the bucketed
    mode may keep only the nearer one (documented collision loss), but
    precise=True must return both."""
    vecs = np.asarray(datasets.random_uniform(1024, 4, seed=190))
    mask = np.zeros(1024, bool)
    # block=512, buckets=256: columns 5 and 261 share bucket 5 of block 0
    mask[[5, 261]] = True
    q = vecs[[5]]
    rows, _ = scan_knn(
        vecs, q, k=2, row_mask=mask, block=512, buckets=256, precise=True
    )
    assert set(np.asarray(rows)[0].tolist()) == {5, 261}


def test_scan_knn_wrong_mask_length_raises():
    import pytest

    vecs = np.asarray(datasets.random_uniform(300, 4, seed=191))
    with pytest.raises(ValueError, match="row_mask"):
        scan_knn(vecs, vecs[:2], k=2, row_mask=np.ones(299, bool))


def test_scan_knn_all_masked():
    vecs = np.asarray(datasets.random_uniform(300, 4, seed=185))
    rows, d2 = scan_knn(
        vecs, vecs[:2], k=2, row_mask=np.zeros(300, bool), block=256
    )
    assert (np.asarray(rows) == -1).all()
    assert np.isinf(np.asarray(d2)).all()


def test_dynamic_allowed_ids():
    from vector_database_tpu import DynamicIndex

    vecs = np.asarray(datasets.random_uniform(600, 5, seed=189))
    dyn = DynamicIndex(vecs[:500], leaf_size=8)
    extra = dyn.add(vecs[500:])  # some rows live in the delta
    allowed = np.asarray([3, 77, int(extra[10])])
    ids, d2 = dyn.knn(vecs[[3, 510]], k=2, allowed_ids=allowed)
    assert ids[0, 0] == 3
    assert ids[1, 0] == int(extra[10])
    assert set(ids.ravel().tolist()) <= set(allowed.tolist())


def test_tree_knn_row_filter():
    vecs = np.asarray(datasets.random_uniform(2000, 6, seed=186))
    queries = np.asarray(datasets.random_uniform(8, 6, seed=187))
    rng = np.random.RandomState(188)
    mask = rng.rand(2000) < 0.5
    index = build_index(vecs, leaf_size=8)
    # explicit radius wide enough to hold the filtered true top-k
    rows, d2 = knn(index, queries, k=4, radius=2.0, row_filter=mask)
    rows, d2 = np.asarray(rows), np.asarray(d2)
    want_r, want_d = filtered_oracle(vecs, queries, mask, 4)
    for i in range(8):
        assert set(rows[i].tolist()) == set(want_r[i].tolist())
    np.testing.assert_allclose(
        np.sort(d2, 1), np.sort(want_d, 1), rtol=1e-5, atol=1e-7
    )
