"""Sharded-forest tests on the 8-device virtual mesh: global top-k merged
from per-shard trees must match the exact brute-force answer."""

import jax
import numpy as np
import pytest

from vector_database_tpu import exact_knn
from vector_database_tpu.parallel import make_mesh
from vector_database_tpu.parallel.forest import build_forest, forest_knn
from vector_database_tpu.utils import datasets


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_forest_knn_matches_exact(mesh):
    vecs = datasets.random_uniform(2000, 8, seed=80)
    forest = build_forest(vecs, mesh, leaf_size=4)
    queries = datasets.random_uniform(12, 8, seed=81)
    rows, d2, ov = forest_knn(forest, queries, k=10, radius=2.5)
    assert not bool(np.asarray(ov).any())
    eidx, ed2 = exact_knn(vecs, queries, k=10)
    np.testing.assert_allclose(
        np.sort(np.asarray(d2), axis=1),
        np.sort(np.asarray(ed2), axis=1),
        rtol=1e-5, atol=1e-6,
    )
    # global row ids must be correct (verify distances recompute)
    rows = np.asarray(rows)
    for qi in range(12):
        for j in range(10):
            r = rows[qi, j]
            if r >= 0:
                true = float(np.sum((vecs[r] - np.asarray(queries[qi])) ** 2))
                assert abs(true - float(np.asarray(d2)[qi, j])) < 1e-4


def test_forest_unbalanced_n(mesh):
    # n not divisible by 8: shard blocks differ in size
    vecs = datasets.random_uniform(1003, 4, seed=82)
    forest = build_forest(vecs, mesh, leaf_size=4)
    queries = vecs[[5, 500, 1002]]
    rows, d2, _ = forest_knn(forest, queries, k=1, radius=0.5)
    rows = np.asarray(rows)
    assert rows[0, 0] == 5 and rows[1, 0] == 500 and rows[2, 0] == 1002
    assert np.allclose(np.asarray(d2)[:, 0], 0.0)


def test_forest_radius_limits(mesh):
    vecs = datasets.random_uniform(500, 4, seed=83)
    forest = build_forest(vecs, mesh)
    q = datasets.random_uniform(1, 4, seed=84)
    rows, d2, _ = forest_knn(forest, q, k=5, radius=0.05)
    d2 = np.asarray(d2)[0]
    # everything returned is truly within the radius
    assert (d2[np.isfinite(d2)] <= 0.05 * 0.05 + 1e-9).all()
