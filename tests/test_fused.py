"""The fused (single-compile) builder must produce exactly the same tree as
the host-loop builder, config for config."""

import numpy as np
import pytest

from vector_database_tpu import build_index, build_index_fused, exact_ball, search
from vector_database_tpu.utils import datasets


def assert_same_tree(a, b):
    np.testing.assert_array_equal(np.asarray(a.dim), np.asarray(b.dim))
    np.testing.assert_array_equal(np.asarray(a.mid), np.asarray(b.mid))
    np.testing.assert_array_equal(np.asarray(a.low), np.asarray(b.low))
    np.testing.assert_array_equal(np.asarray(a.high), np.asarray(b.high))
    np.testing.assert_array_equal(
        np.asarray(a.leaf_start), np.asarray(b.leaf_start)
    )
    np.testing.assert_array_equal(
        np.asarray(a.leaf_count), np.asarray(b.leaf_count)
    )
    np.testing.assert_array_equal(
        np.asarray(a.orig_row), np.asarray(b.orig_row)
    )
    assert a.depth == b.depth
    assert a.leaf_cap == b.leaf_cap
    assert a.num_leaves == b.num_leaves


@pytest.mark.parametrize("leaf_size", [1, 8])
def test_fused_equals_host(leaf_size):
    vecs = datasets.random_uniform(700, 8, seed=41)
    assert_same_tree(
        build_index(vecs, leaf_size=leaf_size),
        build_index_fused(vecs, leaf_size=leaf_size),
    )


def test_fused_duplicates():
    vecs = np.ones((40, 3), np.float32) * 0.25
    assert_same_tree(build_index(vecs), build_index_fused(vecs))


def test_fused_one_hot():
    vecs = datasets.one_hot_crafted(64)
    assert_same_tree(build_index(vecs), build_index_fused(vecs))


def test_fused_max_levels():
    vecs = datasets.random_uniform(256, 4, seed=42)
    assert_same_tree(
        build_index(vecs, max_levels=3),
        build_index_fused(vecs, max_levels=3),
    )


def test_fused_search_oracle():
    vecs = datasets.random_uniform(1500, 8, seed=43)
    index = build_index_fused(vecs, leaf_size=4)
    queries = datasets.random_uniform(8, 8, seed=44)
    res = search(index, queries, 0.5)
    truth = np.asarray(exact_ball(vecs, queries, 0.5))
    for qi in range(8):
        assert set(res.match_rows(qi).tolist()) == set(
            np.nonzero(truth[qi])[0].tolist()
        )


def test_fused_single_vector():
    index = build_index_fused(np.zeros((1, 3), np.float32))
    assert index.num_nodes == 1 and index.num_leaves == 1
