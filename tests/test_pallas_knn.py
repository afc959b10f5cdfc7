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
