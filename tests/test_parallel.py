"""Mesh tests on 8 virtual CPU devices: sharded build must produce exactly
the same tree as the single-device build, and sharded queries the same
results."""

import jax
import numpy as np
import pytest

from vector_database_tpu import build_index, exact_ball, search
from vector_database_tpu.parallel import (
    make_mesh,
    search_sharded,
    knn_sharded,
)
from vector_database_tpu.utils import datasets


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_build_matches_single(mesh):
    vecs = datasets.random_uniform(1000, 8, seed=31)
    single = build_index(vecs)
    sharded = build_index(vecs, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(single.dim), np.asarray(sharded.dim)
    )
    np.testing.assert_array_equal(
        np.asarray(single.low), np.asarray(sharded.low)
    )
    # mids may differ in the last ulp: psum of per-shard partial sums
    # reorders the float accumulation
    np.testing.assert_allclose(
        np.asarray(single.mid), np.asarray(sharded.mid),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(single.orig_row), np.asarray(sharded.orig_row)
    )
    assert single.depth == sharded.depth


def test_sharded_build_unaligned_n(mesh):
    # n not divisible by 8 exercises the padding path
    vecs = datasets.random_uniform(1003, 4, seed=32)
    index = build_index(vecs, mesh=mesh)
    assert index.n == 1003
    truth = np.asarray(exact_ball(vecs, vecs[:4], 0.3))
    res = search(index, vecs[:4], 0.3)
    for i in range(4):
        assert set(res.match_rows(i).tolist()) == set(
            np.nonzero(truth[i])[0].tolist()
        )


def test_search_sharded_oracle(mesh):
    vecs = datasets.random_uniform(2000, 8, seed=33)
    index = build_index(vecs, mesh=mesh)
    queries = datasets.random_uniform(19, 8, seed=34)  # not divisible by 8
    res = search_sharded(index, queries, 0.5, mesh)
    truth = np.asarray(exact_ball(vecs, queries, 0.5))
    for qi in range(19):
        got = set(res.match_rows(qi).tolist())
        want = set(np.nonzero(truth[qi])[0].tolist())
        assert got == want


def test_dim_axis_sharded_build(mesh):
    # 2-D mesh: rows over 4 "data" shards, dims over 2 "model" shards —
    # the tensor-parallel stats path must reproduce the single-device tree
    from vector_database_tpu.parallel import make_mesh_2d

    mesh2 = make_mesh_2d(4, 2)
    vecs = datasets.random_uniform(800, 8, seed=37)
    single = build_index(vecs)
    sharded = build_index(vecs, mesh=mesh2, dim_axis="model")
    np.testing.assert_array_equal(
        np.asarray(single.dim), np.asarray(sharded.dim)
    )
    np.testing.assert_allclose(
        np.asarray(single.mid), np.asarray(sharded.mid),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(single.orig_row), np.asarray(sharded.orig_row)
    )
    # and the search contract holds
    truth = np.asarray(exact_ball(vecs, vecs[:3], 0.4))
    res = search(sharded, vecs[:3], 0.4)
    for i in range(3):
        assert set(res.match_rows(i).tolist()) == set(
            np.nonzero(truth[i])[0].tolist()
        )


def test_dim_axis_uneven_raises(mesh):
    from vector_database_tpu.parallel import make_mesh_2d

    mesh2 = make_mesh_2d(4, 2)
    vecs = datasets.random_uniform(100, 7, seed=38)  # 7 % 2 != 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_index(vecs, mesh=mesh2, dim_axis="model")


def test_knn_sharded(mesh):
    from vector_database_tpu import exact_knn

    vecs = datasets.random_uniform(1000, 8, seed=35)
    index = build_index(vecs, mesh=mesh)
    queries = datasets.random_uniform(5, 8, seed=36)
    rows, d2 = knn_sharded(index, queries, k=5, radius=2.0, mesh=mesh)
    _, ed2 = exact_knn(vecs, queries, k=5)
    np.testing.assert_allclose(
        np.sort(np.asarray(d2), axis=1),
        np.sort(np.asarray(ed2), axis=1),
        rtol=1e-5, atol=1e-6,
    )
