"""Sharded fused build: one global tree over row-sharded data.

Equivalence spine: on integer-valued vectors every f32 segment sum is
exact in any summation order, so the sharded tree must equal the
single-device fused tree BITWISE (node table and global leaf sizes). On
real-valued data the trees may differ in split-plane ulps, so correctness
is asserted through the oracle instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vector_database_tpu import build_index, build_index_fused, exact_ball
from vector_database_tpu.parallel import (
    build_index_sharded,
    knn_global,
    make_mesh,
    search_global,
    to_bsp,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _assert_same_tree(a, b):
    for f in ("dim", "mid", "low", "high"):
        av, bv = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert np.array_equal(av, bv), f


def test_bitwise_equal_to_single_device(mesh):
    rng = np.random.RandomState(3)
    vecs = rng.randint(-4, 5, size=(1000, 6)).astype(np.float32)
    single = build_index_fused(vecs, stats_subsample=1)
    shard = build_index_sharded(vecs, mesh, stats_subsample=1)
    assert single.num_nodes == shard.num_nodes
    _assert_same_tree(single, shard)
    assert np.array_equal(
        np.asarray(shard.leaf_count_global()), np.asarray(single.leaf_count)
    )


def test_bitwise_equal_mean_id_duplicates(mesh):
    """Duplicate-heavy integer data, mean-id ties: host-loop builder,
    single-device fused, and sharded fused all produce the same tree."""
    rng = np.random.RandomState(5)
    dup = np.concatenate([
        np.full((57, 4), 2.0, np.float32),
        rng.randint(-3, 4, size=(300, 4)).astype(np.float32),
    ])
    host = build_index(dup)
    s1 = build_index_fused(dup, tie_break="mean_id", stats_subsample=1)
    s8 = build_index_sharded(
        dup, mesh, tie_break="mean_id", stats_subsample=1
    )
    _assert_same_tree(host, s1)
    _assert_same_tree(s1, s8)
    hr = sorted(tuple(r) for r in host.heap_rows())
    fr = sorted(tuple(r) for r in s1.heap_rows())
    assert hr == fr


def test_search_oracle_uneven_shards(mesh):
    rng = np.random.RandomState(7)
    n = 994  # not a multiple of 8: last shard padded
    vecs = rng.rand(n, 8).astype(np.float32) * 2 - 1
    idx = build_index_sharded(vecs, mesh, leaf_size=4)
    qs = vecs[:6]
    rows, d2, cnt, ov = search_global(idx, qs, 0.4)
    truth = np.asarray(exact_ball(vecs, qs, 0.4))
    for i in range(6):
        got = set(r for r in np.asarray(rows[i]).tolist() if r >= 0)
        want = set(np.nonzero(truth[i])[0].tolist())
        assert got == want
        assert int(cnt[i]) == len(want)
    assert not bool(jnp.any(ov))


def test_knn_global_radius_bounded_oracle(mesh):
    rng = np.random.RandomState(11)
    vecs = rng.rand(600, 8).astype(np.float32) * 2 - 1
    idx = build_index_sharded(vecs, mesh, leaf_size=4)
    qs = vecs[:5]
    kr, kd = knn_global(idx, qs, k=5, radius=1.0, max_leaves=1024)
    d2 = ((vecs[None, :, :] - qs[:, None, :]) ** 2).sum(-1)
    for i in range(5):
        in_r = np.nonzero(d2[i] <= 1.0)[0]
        want = in_r[np.argsort(d2[i][in_r])][:5]
        got = np.asarray(kr[i])
        got = got[got >= 0]
        assert set(got.tolist()) == set(want.tolist())


def test_to_bsp_roundtrip(mesh):
    from vector_database_tpu import search

    rng = np.random.RandomState(13)
    vecs = rng.rand(500, 6).astype(np.float32) * 2 - 1
    idx = build_index_sharded(vecs, mesh, leaf_size=3)
    b = to_bsp(idx)
    assert b.n == 500
    # every original row appears exactly once
    assert sorted(np.asarray(b.orig_row).tolist()) == list(range(500))
    qs = vecs[:4]
    truth = np.asarray(exact_ball(vecs, qs, 0.5))
    res = search(b, qs, 0.5)
    for i in range(4):
        assert set(res.match_rows(i).tolist()) == set(
            np.nonzero(truth[i])[0].tolist()
        )


def test_duplicate_only_dataset(mesh):
    """All rows identical: degenerate splits all the way down."""
    vecs = np.ones((64, 4), np.float32) * 0.5
    idx = build_index_sharded(vecs, mesh, leaf_size=1)
    rows, d2, cnt, _ = search_global(idx, vecs[:2], 0.01)
    for i in range(2):
        got = set(r for r in np.asarray(rows[i]).tolist() if r >= 0)
        assert got == set(range(64))


def test_tiny_n_fewer_rows_than_shards(mesh):
    vecs = np.asarray(
        [[0.0, 1.0], [1.0, 0.0], [-1.0, 0.5]], np.float32
    )
    idx = build_index_sharded(vecs, mesh)
    rows, _, cnt, _ = search_global(idx, vecs, 0.1)
    for i in range(3):
        got = set(r for r in np.asarray(rows[i]).tolist() if r >= 0)
        assert got == {i}


def test_subsample_consistency(mesh):
    """stats_subsample > 1 still yields an oracle-correct tree."""
    rng = np.random.RandomState(17)
    vecs = rng.rand(800, 8).astype(np.float32) * 2 - 1
    idx = build_index_sharded(vecs, mesh, leaf_size=4, stats_subsample=4)
    qs = vecs[:4]
    rows, _, _, _ = search_global(idx, qs, 0.4)
    truth = np.asarray(exact_ball(vecs, qs, 0.4))
    for i in range(4):
        got = set(r for r in np.asarray(rows[i]).tolist() if r >= 0)
        assert got == set(np.nonzero(truth[i])[0].tolist())


def test_donated_input_same_tree(mesh):
    """donate=True consumes the caller's device buffer (the HBM headroom
    lever for the 10M sharded bench) and produces an identical tree."""
    rng = np.random.RandomState(11)
    vecs = rng.randint(-4, 5, size=(700, 5)).astype(np.float32)
    base = build_index_sharded(vecs, mesh, stats_subsample=1)
    dev = jnp.asarray(vecs)
    don = build_index_sharded(dev, mesh, stats_subsample=1, donate=True)
    _assert_same_tree(base, don)
    assert np.array_equal(
        np.asarray(don.leaf_count_global()),
        np.asarray(base.leaf_count_global()),
    )
