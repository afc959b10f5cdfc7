"""MemoryVectorIndex tests — the reference suite, rebuilt.

Mirrors MempryVectorIndex.Tests/MemoryVectorIndexTests.cs: grid fixtures,
the non-normalized degraded path, oracle comparison with zero false
positives / negatives and exact set equality, plus add/remove cycles the
reference never covered.
"""

import numpy as np
import pytest

from vector_database_tpu import MemoryVectorIndex
from vector_database_tpu.utils import datasets


def run_case(vectors, point, distance, threshold=10):
    records = [
        {"id": i, "vector": vectors[i]} for i in range(vectors.shape[0])
    ]
    index = MemoryVectorIndex(
        records, vector_selector=lambda r: r["vector"],
        list_threshold=threshold,
    )
    assert len(index) == len(records)

    point = np.asarray(point, np.float32)
    truth = {
        r["id"]
        for r in records
        if float(np.sqrt(np.sum((r["vector"] - point) ** 2))) <= distance
    }

    calls = [0]

    def predicate(record, q):
        calls[0] += 1
        return float(
            np.sqrt(np.sum((record["vector"] - q) ** 2))
        ) <= distance

    match = {r["id"] for r in index.find(point, distance, predicate)}
    assert match == truth, (
        f"false pos {match - truth}, false neg {truth - match}"
    )
    return index, records, calls[0], len(match)


def test_3x3():
    vecs = np.array(
        [[i - 1, j - 1] for i in range(3) for j in range(3)], np.float32
    )
    run_case(vecs, [0.5, 0.9], 0.6)


def test_10x10():
    run_case(datasets.grid2d(10), [0.3, 0.3], 0.3)


def test_100x100():
    index, _, calls, matched = run_case(
        datasets.grid2d(100), [0.3, 0.3], 0.1
    )
    # selectivity regression signal: predicate calls well under n
    assert calls < 10000 // 4


def test_100x100_not_normalized():
    # degraded path: vectors outside [-1,1] -> oversized buckets, still exact
    run_case(datasets.grid2d_not_normalized(100), [0.3, 0.3], 0.3)


def test_default_predicate_is_exact():
    vecs = datasets.grid2d(10)
    index = MemoryVectorIndex(list(vecs))
    got = {tuple(np.asarray(v)) for v in index.find([0.3, 0.3], 0.3)}
    want = {
        tuple(v)
        for v in vecs
        if float(np.sqrt(np.sum((v - np.array([0.3, 0.3])) ** 2))) <= 0.3
    }
    assert got == want


def test_remove():
    vecs = datasets.grid2d(10)
    index = MemoryVectorIndex(list(vecs))
    n0 = len(index)
    removed = index.remove([0.3, 0.3], 0.3)
    assert removed > 0
    assert len(index) == n0 - removed
    # removed points are no longer found
    assert list(index.find([0.3, 0.3], 0.3)) == []
    # everything else still findable
    rest = list(index.find([0.0, 0.0], 10.0))
    assert len(rest) == n0 - removed


def test_remove_all_then_add():
    vecs = datasets.grid2d(3)
    index = MemoryVectorIndex(list(vecs))
    index.remove([0.0, 0.0], 10.0)
    assert len(index) == 0
    index.add(np.array([0.1, 0.1], np.float32))
    assert len(index) == 1
    assert len(list(index.find([0.1, 0.1], 0.01))) == 1


def test_incremental_add_matches_bulk():
    vecs = datasets.random_uniform(300, 3, seed=21)
    index = MemoryVectorIndex()
    for v in vecs:
        index.add(v)
    assert len(index) == 300
    q = vecs[7]
    got = {tuple(np.asarray(v)) for v in index.find(q, 0.4)}
    want = {
        tuple(v)
        for v in vecs
        if float(np.sqrt(np.sum((v - q) ** 2))) <= 0.4
    }
    assert got == want


def test_duplicates_bad_distribution():
    # > threshold identical vectors can never split: degraded bucket
    vecs = [np.array([0.5, 0.5], np.float32)] * 25
    index = MemoryVectorIndex(vecs, list_threshold=10)
    assert len(index) == 25
    assert len(list(index.find([0.5, 0.5], 0.0))) == 25


def test_clear():
    index = MemoryVectorIndex(list(datasets.grid2d(3)))
    index.clear()
    assert len(index) == 0
    assert list(index.find([0, 0], 1.0)) == []


def test_invalid_args():
    with pytest.raises(ValueError):
        MemoryVectorIndex(list_threshold=0)
    index = MemoryVectorIndex([np.array([0.1, 0.2], np.float32)])
    with pytest.raises(ValueError):
        index.add(np.array([0.1, 0.2, 0.3], np.float32))
    with pytest.raises(ValueError):
        list(index.find([0.1], 0.5))


def test_hierarchy():
    index = MemoryVectorIndex(list(datasets.grid2d(10)))
    nodes = list(index.index_hierarchy)
    roots = [n for n in nodes if n[1] == -1]
    assert len(roots) == 1
    total = sum(len(n[3]) for n in nodes if n[3] is not None)
    assert total == len(index)


def test_to_bsp_device_search():
    from vector_database_tpu import exact_ball, search

    vecs = datasets.random_uniform(400, 3, seed=130)
    index = MemoryVectorIndex(list(vecs), list_threshold=5)
    bsp, records = index.to_bsp()
    assert len(records) == 400
    mat = np.stack([np.asarray(r) for r in records])
    queries = datasets.random_uniform(6, 3, seed=131)
    res = search(bsp, queries, 0.4)
    truth = np.asarray(exact_ball(mat, queries, 0.4))
    for qi in range(6):
        got = set(res.match_rows(qi).tolist())
        want = set(np.nonzero(truth[qi])[0].tolist())
        assert got == want
    # device results agree with the host trie walk
    host = {
        tuple(np.asarray(r))
        for r in index.find(queries[0], 0.4)
    }
    dev = {tuple(mat[r]) for r in res.match_rows(0)}
    assert host == dev


def test_to_bsp_after_removals():
    from vector_database_tpu import exact_ball, search

    vecs = datasets.grid2d(12)
    index = MemoryVectorIndex(list(vecs))
    index.remove([0.0, 0.0], 0.3)
    bsp, records = index.to_bsp()
    mat = np.stack([np.asarray(r) for r in records])
    assert len(records) == len(index)
    res = search(bsp, np.array([[0.5, 0.5]], np.float32), 0.4)
    truth = np.asarray(exact_ball(mat, [[0.5, 0.5]], 0.4))
    assert set(res.match_rows(0).tolist()) == set(
        np.nonzero(truth[0])[0].tolist()
    )


def test_find_batch_oracle():
    vecs = datasets.grid2d(10)
    index = MemoryVectorIndex(list(vecs))
    records, match = index.find_batch(
        np.array([[0.3, 0.3], [0.0, 0.0]], np.float32), 0.3
    )
    assert match.shape == (2, 100)
    q = np.array([0.3, 0.3], np.float32)
    for j, r in enumerate(records):
        want = float(np.sum((np.asarray(r) - q) ** 2)) <= 0.3 * 0.3 + 1e-12
        assert bool(match[0, j]) == want


def test_locate_on_plane_coordinate():
    """A record with a coordinate exactly ON a trie cell center (e.g.
    0.0 at the root) routes HIGH at build (v >= center); locate must
    reproduce that deterministic tie rule on to_bsp trees (regression:
    it descended low and returned -1)."""
    from vector_database_tpu.search import locate

    rng = np.random.RandomState(9)
    recs = rng.rand(40, 3).astype(np.float32) * 2 - 1
    recs[7, 0] = 0.0  # exactly on the root split plane of dim 0
    recs[19, 1] = 0.0
    idx = MemoryVectorIndex(
        [(i, recs[i]) for i in range(40)],
        vector_selector=lambda r: r[1],
        list_threshold=2,
    )
    bsp, records = idx.to_bsp()
    assert bsp.ties_high
    rows = np.asarray(locate(bsp, recs))
    assert (rows >= 0).all()
    for i in range(40):
        assert records[rows[i]][0] == i


def test_nan_record_survives_split():
    """A NaN coordinate satisfies neither side of a `< c` / `>= c` split
    pair — the split must route it by complement (like add does), not
    silently drop it from the bucket."""
    recs = [(i, np.array([0.1 * i - 0.5, 0.2], np.float32))
            for i in range(6)]
    recs.append((99, np.array([np.nan, 0.2], np.float32)))
    idx = MemoryVectorIndex(
        recs, vector_selector=lambda r: r[1], list_threshold=4
    )
    # force enough adds that the NaN record's bucket splits
    for i in range(6, 20):
        idx.add((i, np.array([0.1 * (i % 10) - 0.5, -0.3], np.float32)))
    assert len(idx) == len(recs) + 14
    total = sum(len(b) for b in idx._buckets.values())
    assert total == len(idx)  # no record silently dropped
