"""Oracle-comparison tests for the batched tree search.

The spine of the reference test strategy (MemoryVectorIndexTests.cs:136-207):
every index configuration is validated against a brute-force scan — zero
false positives, zero false negatives, exact set equality — and the
candidates-examined statistic generalizes the predicate-call count.
"""

import numpy as np
import pytest

from vector_database_tpu import build_index, exact_ball, exact_knn, search, knn
from vector_database_tpu.utils import datasets


def oracle_check(vectors, queries, radius, leaf_size=1, **kw):
    index = build_index(vectors, leaf_size=leaf_size)
    res = search(index, queries, radius, **kw)
    assert not bool(np.asarray(res.overflow).any())
    truth = np.asarray(exact_ball(vectors, queries, radius))
    for qi in range(queries.shape[0]):
        got = set(res.match_rows(qi).tolist())
        want = set(np.nonzero(truth[qi])[0].tolist())
        assert got == want, (
            f"query {qi}: false pos {got - want}, false neg {want - got}"
        )
        assert int(np.asarray(res.count)[qi]) == len(want)
    return res, index


@pytest.mark.parametrize("leaf_size", [1, 4])
def test_grid_10x10(leaf_size):
    vecs = datasets.grid2d(10)
    queries = np.array([[0.3, 0.3], [0.0, 0.0], [-0.9, 0.9]], np.float32)
    oracle_check(vecs, queries, 0.3, leaf_size=leaf_size)


def test_grid_100x100():
    vecs = datasets.grid2d(100)
    queries = np.array([[0.3, 0.3]], np.float32)
    res, _ = oracle_check(vecs, queries, 0.1)
    # selectivity: candidates examined should be far below n
    assert int(np.asarray(res.candidates)[0]) < vecs.shape[0] // 4


@pytest.mark.parametrize("leaf_size", [1, 8])
def test_random(leaf_size):
    vecs = datasets.random_uniform(2000, 8, seed=7)
    queries = datasets.random_uniform(16, 8, seed=8)
    oracle_check(vecs, queries, 0.5, leaf_size=leaf_size)


def test_radius_zero_exact_match():
    vecs = datasets.random_uniform(300, 4, seed=9)
    queries = vecs[[5, 17, 250]]
    res, _ = oracle_check(vecs, queries, 0.0)
    counts = np.asarray(res.count)
    assert (counts >= 1).all()


def test_duplicates():
    base = datasets.random_uniform(50, 4, seed=10)
    vecs = np.concatenate([base, base[:10]])  # 10 duplicated vectors
    queries = base[[0, 5]]
    oracle_check(vecs, queries, 0.0)


def test_overflow_auto_grow():
    vecs = datasets.random_uniform(500, 2, seed=11)
    queries = np.zeros((1, 2), np.float32)
    # huge radius -> every leaf matches; tiny initial buffer must auto-grow
    res, _ = oracle_check(vecs, queries, 10.0, max_leaves=4)
    assert int(np.asarray(res.count)[0]) == 500


def test_knn_matches_exact():
    vecs = datasets.random_uniform(1000, 8, seed=12)
    queries = datasets.random_uniform(8, 8, seed=13)
    index = build_index(vecs)
    rows, d2 = knn(index, queries, k=10, radius=2.0)
    eidx, ed2 = exact_knn(vecs, queries, k=10)
    rows, d2 = np.asarray(rows), np.asarray(d2)
    eidx, ed2 = np.asarray(eidx), np.asarray(ed2)
    for qi in range(queries.shape[0]):
        # distances must agree (ids may differ on exact ties)
        np.testing.assert_allclose(
            np.sort(d2[qi]), np.sort(ed2[qi]), rtol=1e-5, atol=1e-6
        )


def test_knn_auto_radius():
    vecs = datasets.random_uniform(800, 6, seed=15)
    index = build_index(vecs, leaf_size=4)
    queries = datasets.random_uniform(6, 6, seed=16)
    rows, d2 = knn(index, queries, k=5)  # no radius given
    eidx, ed2 = exact_knn(vecs, queries, k=5)
    rows, d2 = np.asarray(rows), np.asarray(d2)
    # calibrated radius covers ~95% of k-th neighbors: near-exact here
    hits = sum(
        len(set(rows[i].tolist()) & set(np.asarray(eidx)[i].tolist()))
        for i in range(6)
    )
    assert hits >= 27  # >= 90%


def test_single_query_1d_shape():
    vecs = datasets.random_uniform(100, 4, seed=14)
    index = build_index(vecs)
    res = search(index, vecs[3], 0.0)  # [D] query auto-promoted
    assert 3 in set(res.match_rows(0).tolist())


def test_locate():
    from vector_database_tpu import build_index_fused
    from vector_database_tpu.search import locate

    # data with no coordinate ever equal to a split mean: random uniform
    vecs = np.asarray(datasets.random_uniform(700, 6, seed=95))
    index = build_index_fused(vecs, leaf_size=5)
    rows = np.asarray(locate(index, vecs[::7]))
    assert rows.tolist() == list(range(0, 700, 7))
    # absent vectors -> -1
    probe = vecs[:4] + 10.0
    assert (np.asarray(locate(index, probe)) == -1).all()
    # duplicate-heavy data: dual (dim == -2) nodes still route to a
    # leaf holding a copy
    dup = np.repeat(vecs[:10], 11, axis=0)
    didx = build_index_fused(dup, leaf_size=3)
    drows = np.asarray(locate(didx, vecs[:10]))
    assert (drows >= 0).all()
    for i, r in enumerate(drows.tolist()):
        assert (dup[r] == vecs[i]).all()


def test_locate_dual_node_constant_column():
    """Advisor repro (round 2): under split="alternate", a constant
    column makes the min-variance levels choose a zero-variance dim ->
    dual (dim == -2) nodes whose children are NOT identical rows. The
    single-branch descent's low-child guess must fall back to the exact
    dual-descent search for those queries — every existing row locates."""
    from vector_database_tpu import build_index_fused
    from vector_database_tpu.search import locate

    rng = np.random.RandomState(7)
    vecs = rng.rand(512, 6).astype(np.float32)
    vecs[:, 3] = 0.25  # constant column -> dual nodes on min-var levels
    index = build_index_fused(vecs, leaf_size=4)
    assert (np.asarray(index.dim) == -2).any()  # the repro's precondition
    rows = np.asarray(locate(index, vecs[::5]))
    assert rows.tolist() == list(range(0, 512, 5))
    # absent vectors still miss
    assert (np.asarray(locate(index, vecs[:4] + 10.0)) == -1).all()


def test_knn_k_exceeds_candidate_width():
    """k larger than the candidate buffer (small index / few leaves) must
    pad to [Q, k] with -1/+inf per the contract, not crash in top_k."""
    from vector_database_tpu import build_index_fused, knn

    vecs = datasets.random_uniform(16, 4, seed=31)
    index = build_index_fused(vecs, leaf_size=8)
    rows, d2 = knn(index, np.asarray(vecs[:2]), k=20, radius=10.0)
    rows, d2 = np.asarray(rows), np.asarray(d2)
    assert rows.shape == (2, 20) and d2.shape == (2, 20)
    for i in range(2):
        got = rows[i][rows[i] >= 0]
        assert set(got.tolist()) == set(range(16))
        assert np.isinf(d2[i][rows[i] < 0]).all()
