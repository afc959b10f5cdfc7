"""Seeded property fuzz: random configurations vs the brute-force oracle.

Each case draws a random (n, d, leaf_size, radius, k, block, buckets,
metric, probes) configuration and checks the library's invariants that
must hold for EVERY configuration:

- tree ε-ball search: exact set equality with the oracle (zero false
  positives / negatives) — the reference test suite's core assertion
  (MemoryVectorIndexTests.cs:185-204);
- tree knn: distances are true f32 distances of the returned rows and
  never exceed the radius;
- packed scan: returned distances are exact for returned rows; row ids
  in range; -1 padding carries +inf;
- pruned scan at full real coverage == full scan bitwise.

Sizes are kept small so the whole sweep runs in ~a minute on CPU; the
value is the CONFIG diversity, not the data volume.
"""

import numpy as np
import pytest

from vector_database_tpu import (
    build_index_fused,
    exact_ball,
    knn,
    search,
)
from vector_database_tpu.ops.pallas_knn import (
    pack_database,
    pallas_scan_knn_packed,
)

CASES = list(range(12))


def _data(rng, n, d, flavor):
    if flavor == 0:  # uniform
        return (rng.rand(n, d).astype(np.float32) * 2 - 1)
    if flavor == 1:  # clustered
        c = rng.rand(max(4, n // 64), d).astype(np.float32) * 2 - 1
        return (
            c[rng.randint(0, c.shape[0], n)]
            + 0.05 * rng.randn(n, d)
        ).astype(np.float32)
    if flavor == 2:  # duplicates + ties
        base = rng.rand(max(2, n // 8), d).astype(np.float32)
        return base[rng.randint(0, base.shape[0], n)]
    # one-hot-ish degenerate (every dim same stats)
    m = np.zeros((n, d), np.float32)
    m[np.arange(n), rng.randint(0, d, n)] = 1.0
    return m


@pytest.mark.parametrize("case", CASES)
def test_fuzz_config(case):
    rng = np.random.RandomState(1000 + case)
    n = int(rng.randint(50, 3000))
    d = int(rng.randint(2, 33))
    leaf = int(rng.choice([1, 2, 8, 16, 64]))
    flavor = case % 4
    vecs = _data(rng, n, d, flavor)
    qn = int(rng.randint(1, 9))
    queries = _data(rng, qn, d, flavor)

    index = build_index_fused(vecs, leaf_size=leaf)

    # ε-ball exactness at a radius that matches a few rows
    sample = vecs[rng.randint(0, n, min(n, 64))]
    d2s = ((sample[None] - queries[:, None]) ** 2).sum(-1)
    radius = float(np.sqrt(np.quantile(d2s, 0.05)) + 1e-3)
    res = search(index, queries, radius)
    truth = np.asarray(exact_ball(vecs, queries, radius))
    for qi in range(qn):
        got = set(res.match_rows(qi).tolist())
        want = set(np.nonzero(truth[qi])[0].tolist())
        assert got == want, (case, n, d, leaf, flavor, qi)

    # tree knn invariants
    k = int(rng.randint(1, 6))
    rows, kd2 = knn(index, queries, k=k, radius=radius)
    rows, kd2 = np.asarray(rows), np.asarray(kd2)
    for qi in range(qn):
        for j in range(k):
            r = rows[qi, j]
            if r < 0:
                assert not np.isfinite(kd2[qi, j])
                continue
            true = float(((vecs[r] - queries[qi]) ** 2).sum())
            assert abs(true - kd2[qi, j]) < 1e-3
            assert kd2[qi, j] <= radius * radius + 1e-5

    # packed scan invariants (+ pruned full-coverage equality)
    block = int(rng.choice([128, 256, 512]))
    buckets = int(rng.choice([64, 128]))
    pack = pack_database(index.vectors, block=block, buckets=buckets)
    fr, fd = pallas_scan_knn_packed(pack, queries, k=k, q_tile=8)
    fr, fd = np.asarray(fr), np.asarray(fd)
    lm = np.asarray(index.vectors)
    assert ((fr >= -1) & (fr < n)).all()
    for qi in range(qn):
        for j in range(k):
            r = fr[qi, j]
            if r < 0:
                assert not np.isfinite(fd[qi, j])
                continue
            true = float(((lm[r] - queries[qi]) ** 2).sum())
            assert abs(true - fd[qi, j]) < 1e-3
    nb = pack.vb.shape[0]
    if nb > 1:
        pr, pd = pallas_scan_knn_packed(
            pack, queries, k=k, q_tile=8, probes=nb
        )
        assert np.array_equal(fr, np.asarray(pr))


@pytest.mark.parametrize("case", range(6))
def test_fuzz_dynamic_model(case):
    """Model-based fuzz of the mutable index: a random op sequence
    (add / remove-ball / remove-by-id / compact / search / knn) runs
    against DynamicIndex and a plain numpy model; results must agree
    exactly after every query."""
    from vector_database_tpu import DynamicIndex

    rng = np.random.RandomState(2000 + case)
    d = int(rng.randint(2, 9))
    index = DynamicIndex(leaf_size=int(rng.choice([1, 4, 8])))
    model = {}  # id -> vector

    def model_ball(q, r):
        if not model:
            return set()
        ids = np.fromiter(model.keys(), np.int64)
        mat = np.stack([model[i] for i in ids])
        d2 = ((mat - q) ** 2).sum(1)
        return set(ids[d2 <= np.float32(r) ** 2].tolist())

    for _ in range(30):
        op = rng.randint(0, 6)
        if op <= 1 or not model:  # add (weighted; forced when empty)
            m = int(rng.randint(1, 40))
            vecs = (rng.rand(m, d).astype(np.float32) * 2 - 1)
            ids = index.add(vecs)
            for i, v in zip(ids.tolist(), vecs):
                model[i] = v
        elif op == 2:  # remove ball
            q = rng.rand(d).astype(np.float32) * 2 - 1
            r = float(rng.rand() * 0.8)
            removed = index.remove(q, r)
            gone = model_ball(q, r)
            assert removed == len(gone)
            for i in gone:
                del model[i]
        elif op == 3:  # remove by id
            ids = rng.choice(
                list(model.keys()),
                size=min(len(model), rng.randint(1, 6)),
                replace=False,
            )
            removed = index.remove_ids(ids)
            assert removed == len(set(ids.tolist()) & model.keys())
            for i in ids.tolist():
                model.pop(i, None)
        elif op == 4:
            index.compact()
        else:  # query
            q = rng.rand(1, d).astype(np.float32) * 2 - 1
            r = float(rng.rand() * 0.9 + 0.05)
            got_ids, got_d2 = index.search(q, r)[0]
            assert set(got_ids.tolist()) == model_ball(q[0], r)
            if model:
                k = int(rng.randint(1, 5))
                rows, kd2 = index.knn(q, k=k)
                rows = rows[0]
                ids = np.fromiter(model.keys(), np.int64)
                mat = np.stack([model[i] for i in ids])
                d2 = ((mat - q[0]) ** 2).sum(1)
                got = set(rows[rows >= 0].tolist())
                # ties at the k-th distance make the exact id set
                # ambiguous; compare distances instead
                kk = min(k, len(model))
                np.testing.assert_allclose(
                    np.sort(np.asarray(kd2[0][:kk])),
                    np.sort(np.sort(d2)[:kk]),
                    rtol=1e-5, atol=1e-6,
                )
                assert len(got) == kk
        assert len(index) == len(model)
