"""The fused (single-compile) builder must produce exactly the same tree as
the host-loop builder, config for config."""

import numpy as np
import pytest

from vector_database_tpu import build_index, build_index_fused, exact_ball, search
from vector_database_tpu.utils import datasets


def assert_same_tree(a, b):
    """Same structure; split planes may differ in the last float ulp
    (prefix-sum vs scatter-sum accumulation order), and leaf-major row
    layouts may legitimately differ — compare each node's bucket as a set.
    """
    np.testing.assert_array_equal(np.asarray(a.dim), np.asarray(b.dim))
    np.testing.assert_allclose(
        np.asarray(a.mid), np.asarray(b.mid), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(a.low), np.asarray(b.low))
    np.testing.assert_array_equal(np.asarray(a.high), np.asarray(b.high))
    np.testing.assert_array_equal(
        np.asarray(a.leaf_count), np.asarray(b.leaf_count)
    )
    a_start, b_start = np.asarray(a.leaf_start), np.asarray(b.leaf_start)
    a_rows, b_rows = np.asarray(a.orig_row), np.asarray(b.orig_row)
    count = np.asarray(a.leaf_count)
    for node in np.nonzero(np.asarray(a.dim) == -1)[0]:
        c = count[node]
        assert set(a_rows[a_start[node] : a_start[node] + c]) == set(
            b_rows[b_start[node] : b_start[node] + c]
        ), f"leaf {node} bucket mismatch"
    assert a.depth == b.depth
    assert a.leaf_cap == b.leaf_cap
    assert a.num_leaves == b.num_leaves


@pytest.mark.parametrize("leaf_size", [1, 8])
def test_fused_random_invariants_and_oracle(leaf_size):
    # On arbitrary float data the two builders may pick different split
    # dims at near-tied variances (different summation order), so tree
    # identity is not a sound expectation — the contract (structural
    # validity + exact search) is.
    from test_build import check_tree

    vecs = datasets.random_uniform(700, 8, seed=41)
    index = build_index_fused(vecs, leaf_size=leaf_size)
    check_tree(index, vecs, leaf_size)
    queries = datasets.random_uniform(8, 8, seed=45)
    res = search(index, queries, 0.6)
    truth = np.asarray(exact_ball(vecs, queries, 0.6))
    for qi in range(8):
        assert set(res.match_rows(qi).tolist()) == set(
            np.nonzero(truth[qi])[0].tolist()
        )


def test_fused_duplicates():
    # exact arithmetic (identical values, consecutive ids): the positional
    # tie-break matches the mean-id tie-break tree for tree
    vecs = np.ones((40, 3), np.float32) * 0.25
    assert_same_tree(build_index(vecs), build_index_fused(vecs))


def test_fused_one_hot():
    # 0/1 values: all sums exact in f32 -> builders must agree exactly
    vecs = datasets.one_hot_crafted(64)
    assert_same_tree(build_index(vecs), build_index_fused(vecs))


def test_fused_max_levels():
    from test_build import check_tree

    vecs = datasets.random_uniform(256, 4, seed=42)
    index = build_index_fused(vecs, max_levels=3)
    assert index.depth <= 3
    assert index.leaf_cap > 1
    check_tree(index, vecs, leaf_size=index.leaf_cap)


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


def test_fused_progress_callback():
    # streamed per-level progress from inside the compiled while_loop
    seen = []
    index = build_index_fused(
        datasets.random_uniform(500, 4, seed=21), leaf_size=4,
        progress=lambda lvl, s, rows: seen.append(
            (int(lvl), int(s), int(rows))
        ),
    )
    assert len(seen) == index.depth
    assert seen[0] == (0, 1, 500)
    levels = [x[0] for x in seen]
    assert levels == list(range(index.depth))
    # active rows shrink monotonically as leaves retire
    rows = [x[2] for x in seen]
    assert all(a >= b for a, b in zip(rows, rows[1:]))
