"""Pallas fused k-NN kernel (interpret mode on CPU) vs the exact oracle.

The kernel's shortlist has one slot per 128 database rows, so exact-recall
assertions only hold for queries whose neighbors can't collide (self-queries
with distance 0 always win their bucket); statistical recall is asserted
with collision-aware margins.
"""

import numpy as np

from vector_database_tpu import exact_knn
from vector_database_tpu.ops.pallas_knn import pallas_scan_knn
from vector_database_tpu.utils import datasets


def test_self_queries_and_padding():
    # n, d, q all unaligned to block/tile/lane sizes
    vecs = datasets.random_uniform(777, 13, seed=112)
    queries = vecs[[0, 400, 776]]
    rows, d2 = pallas_scan_knn(vecs, queries, k=1, block=128, q_tile=8)
    rows = np.asarray(rows)
    assert rows[:, 0].tolist() == [0, 400, 776]
    assert np.allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-5)
    assert (rows < 777).all()


def test_recall_and_distance_exactness():
    vecs = datasets.random_uniform(8192, 24, seed=110)
    queries = datasets.random_uniform(8, 24, seed=111)
    k = 3
    rows, d2 = pallas_scan_knn(
        vecs, queries, k=k, block=512, q_tile=8, oversample=8
    )
    eidx, _ = exact_knn(vecs, queries, k=k)
    rows, eidx = np.asarray(rows), np.asarray(eidx)
    total = sum(
        len(set(rows[i].tolist()) & set(eidx[i].tolist())) for i in range(8)
    )
    # 64 bucket slots, 3 near-tied uniform-data neighbors: allow collisions
    assert total >= 17  # >= ~70% recall
    # returned distances are true f32 distances of the returned rows
    d2 = np.asarray(d2)
    qs = np.asarray(queries)
    for qi in range(8):
        for j in range(k):
            r = rows[qi, j]
            if r >= 0:
                true = float(np.sum((vecs[r] - qs[qi]) ** 2))
                assert abs(true - d2[qi, j]) < 1e-3


def test_quantized_dtypes_recall():
    # int8 / int8f storage modes: exact-integer and cast-to-bf16 scoring
    vecs = datasets.random_uniform(4096, 16, seed=115)
    queries = datasets.random_uniform(16, 16, seed=116)
    eidx, _ = exact_knn(vecs, queries, k=5)
    eidx = np.asarray(eidx)
    for dtype in ("int8", "int8f"):
        rows, d2 = pallas_scan_knn(
            vecs, queries, k=5, block=512, q_tile=8, dtype=dtype
        )
        rows = np.asarray(rows)
        total = sum(
            len(set(rows[i].tolist()) & set(eidx[i].tolist()))
            for i in range(16)
        )
        assert total >= 64, (dtype, total)  # >= 80% of 16*5
        # distances are exact f32 reranks of the returned rows
        qs = np.asarray(queries)
        d2 = np.asarray(d2)
        for qi in range(16):
            r = rows[qi, 0]
            true = float(np.sum((np.asarray(vecs)[r] - qs[qi]) ** 2))
            assert abs(true - d2[qi, 0]) < 1e-3


def test_clustered_high_recall():
    rng = np.random.default_rng(113)
    centers = (rng.random((64, 32)) * 2 - 1).astype(np.float32)
    assign = rng.integers(0, 64, 16384)
    vecs = centers[assign] + rng.normal(0, 0.05, (16384, 32)).astype(
        np.float32
    )
    queries = centers[:8] + rng.normal(0, 0.05, (8, 32)).astype(np.float32)
    rows, _ = pallas_scan_knn(
        vecs, queries, k=10, block=1024, q_tile=8, oversample=8
    )
    eidx, _ = exact_knn(vecs, queries, k=10)
    rows, eidx = np.asarray(rows), np.asarray(eidx)
    total = sum(
        len(set(rows[i].tolist()) & set(eidx[i].tolist())) for i in range(8)
    )
    assert total >= 72  # >= 90% recall with 128 bucket slots


def test_metric_cosine():
    # cosine = L2 over unit rows; compare against the normalized oracle
    rng = np.random.default_rng(141)
    vecs = (rng.random((3000, 24)) * 4 - 2).astype(np.float32)
    # non-unit norms so cosine genuinely differs from raw L2
    vecs *= rng.random((3000, 1)).astype(np.float32) * 3 + 0.1
    queries = (rng.random((16, 24)) * 4 - 2).astype(np.float32)
    from vector_database_tpu.ops.exact import normalize_rows

    nv = np.asarray(normalize_rows(vecs))
    nq = np.asarray(normalize_rows(queries))
    eidx, ed2 = exact_knn(nv, nq, k=5)
    rows, d2 = pallas_scan_knn(
        vecs, queries, k=5, block=512, q_tile=8, metric="cosine"
    )
    rows, eidx = np.asarray(rows), np.asarray(eidx)
    hits = sum(
        len(set(rows[i].tolist()) & set(eidx[i].tolist()))
        for i in range(16)
    )
    assert hits >= 72  # >= 90%
    # distances are normalized-space d2: cos = 1 - d2/2 in [-1, 1]
    cos = 1 - np.asarray(d2)[:, 0] / 2
    assert np.all(cos <= 1.0 + 1e-5) and np.all(cos >= -1.0 - 1e-5)


def test_exact_mips_k_exceeds_n():
    """k > n must pad with -1 / -inf (the exact_knn contract), not crash."""
    from vector_database_tpu.ops.exact import exact_mips

    vecs = np.eye(3, 4, dtype=np.float32)
    idx, dots = exact_mips(vecs, vecs[:2], k=5)
    idx, dots = np.asarray(idx), np.asarray(dots)
    assert idx.shape == (2, 5) and dots.shape == (2, 5)
    assert (idx[:, 3:] == -1).all()
    assert np.isneginf(dots[:, 3:]).all()
    assert idx[0, 0] == 0 and idx[1, 0] == 1


def test_pack_empty_database_raises():
    import pytest

    from vector_database_tpu.ops.pallas_knn import pack_database

    with pytest.raises(ValueError, match="empty"):
        pack_database(np.zeros((0, 8), np.float32), block=256, buckets=64)


def test_metric_ip():
    from vector_database_tpu.ops.exact import exact_mips

    rng = np.random.default_rng(142)
    vecs = (rng.random((3000, 24)) * 2 - 1).astype(np.float32)
    vecs *= rng.random((3000, 1)).astype(np.float32) * 2 + 0.1
    queries = (rng.random((16, 24)) * 2 - 1).astype(np.float32)
    eidx, edots = exact_mips(vecs, queries, k=5)
    rows, dots = pallas_scan_knn(
        vecs, queries, k=5, block=512, q_tile=8, metric="ip"
    )
    rows, dots = np.asarray(rows), np.asarray(dots)
    eidx, edots = np.asarray(eidx), np.asarray(edots)
    hits = sum(
        len(set(rows[i].tolist()) & set(eidx[i].tolist()))
        for i in range(16)
    )
    assert hits >= 72
    # dots are exact f32 inner products of the returned rows, descending
    for qi in range(16):
        true = float(np.dot(vecs[rows[qi, 0]], queries[qi]))
        assert abs(true - dots[qi, 0]) < 1e-3
        assert np.all(np.diff(dots[qi]) <= 1e-6)
