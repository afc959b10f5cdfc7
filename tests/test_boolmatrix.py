"""Boolean property-matrix (KB/Akinator) mode tests."""

import numpy as np

from vector_database_tpu.models.boolmatrix import (
    BoolMatrixIndex,
    pack_bits,
    unpack_bits,
)


def random_matrix(n=200, p=40, seed=60):
    rng = np.random.default_rng(seed)
    return rng.random((n, p)) < 0.5


def hamming(a, b):
    return int(np.sum(a != b))


def test_pack_roundtrip():
    m = random_matrix(17, 70)
    assert (unpack_bits(pack_bits(m), 70) == m).all()


def test_identify():
    m = random_matrix()
    # ensure uniqueness of rows for identification
    m = np.unique(m, axis=0)
    index = BoolMatrixIndex(m)
    for i in (0, len(m) // 2, len(m) - 1):
        assert index.identify(m[i]) == i
    # a vector not in the set
    probe = m[0].copy()
    probe[:3] = ~probe[:3]
    if not any((row == probe).all() for row in m):
        assert index.identify(probe) is None


def test_find_hamming_oracle():
    m = random_matrix(150, 24, seed=61)
    index = BoolMatrixIndex(m, leaf_size=4)
    rng = np.random.default_rng(62)
    queries = rng.random((5, 24)) < 0.5
    results = index.find_hamming(queries, 3)
    for qi in range(5):
        rows, dists = results[qi]
        want = {
            i for i in range(len(m)) if hamming(m[i], queries[qi]) <= 3
        }
        assert set(rows.tolist()) == want
        for r, dd in zip(rows, dists):
            assert hamming(m[r], queries[qi]) == dd


def test_knn_hamming():
    m = random_matrix(300, 32, seed=63)
    index = BoolMatrixIndex(m)
    q = m[17]
    rows, dists = index.knn_hamming(q, k=5)
    assert rows.shape == (1, 5)
    assert dists[0, 0] == 0 and rows[0, 0] == 17
    # distances must be the true smallest hamming distances
    all_d = sorted(hamming(m[i], q) for i in range(len(m)))
    assert sorted(dists[0].tolist()) == all_d[:5]


def test_best_question():
    # property 0: constant (useless); property 1: perfect 50/50
    m = np.zeros((10, 3), dtype=bool)
    m[:5, 1] = True
    m[:3, 2] = True
    index = BoolMatrixIndex(m)
    assert index.best_question() == 1
    # among a candidate subset the best question can change
    assert index.best_question([0, 1, 2, 3]) in (1, 2)


def test_identify_batch():
    m = np.unique(random_matrix(400, 32, seed=66), axis=0)
    index = BoolMatrixIndex(m, leaf_size=4)
    # all members identify to themselves, in one batch
    rows = np.asarray(index.identify_batch(m))
    assert rows.tolist() == list(range(len(m)))
    # perturbed non-members come back -1
    probes = m[:16].copy()
    probes[:, :5] = ~probes[:, :5]
    member = np.array(
        [any((row == pr).all() for row in m) for pr in probes]
    )
    got = np.asarray(index.identify_batch(probes))
    assert ((got >= 0) == member).all()


def test_knn_hamming_k_exceeds_n():
    rng = np.random.RandomState(7)
    m = rng.rand(6, 32) < 0.5
    index = BoolMatrixIndex(m, leaf_size=2)
    rows, ham = index.knn_hamming(m[:2], k=10)
    assert rows.shape == (2, 10) and ham.shape == (2, 10)
    assert (rows[:, 6:] == -1).all()
    assert rows[0, 0] == 0 and ham[0, 0] == 0
    assert rows[1, 0] == 1 and ham[1, 0] == 0


def test_best_question_empty_candidates_raises():
    import pytest

    rng = np.random.RandomState(8)
    index = BoolMatrixIndex(rng.rand(8, 16) < 0.5, leaf_size=2)
    with pytest.raises(ValueError, match="empty"):
        index.best_question(candidate_rows=[])
