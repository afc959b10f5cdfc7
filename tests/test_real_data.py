"""Real-data end-to-end: the vendored UCI digits ARFF fixture.

Mirrors the reference's real-dataset test (MemoryVectorIndexTests.cs:
116-134: download 2d-10c.arff, min-max normalize, index, oracle-compare)
with a committed fixture instead of a network fetch: 1797 real 8x8
handwritten-digit images through ARFF ingest -> normalization -> every
index family -> brute-force oracle.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vector_database_tpu import (
    MemoryVectorIndex,
    build_index_fused,
    exact_ball,
    exact_knn,
    knn,
    scan_knn,
    search,
)
from vector_database_tpu.ops.pallas_knn import pallas_scan_knn
from vector_database_tpu.utils.arff import load_arff, minmax_normalize

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "digits-64.arff")


@pytest.fixture(scope="module")
def digits():
    data, names, labels = load_arff(FIXTURE)
    assert data.shape == (1797, 64)
    assert len(names) == 64
    assert labels is not None and labels.shape == (1797,)
    assert set(np.unique(labels)) == set(range(10))
    # raw pixels are ints in [0, 16]
    assert data.min() == 0.0 and data.max() == 16.0
    vecs = minmax_normalize(data)
    assert vecs.min() >= -1.0 and vecs.max() <= 1.0
    return vecs, labels


def test_bsp_oracle_on_digits(digits):
    vecs, _ = digits
    idx = build_index_fused(vecs, leaf_size=8)
    qs = vecs[:16]
    radius = 2.0
    res = search(idx, qs, radius)
    truth = np.asarray(exact_ball(vecs, qs, radius))
    for i in range(16):
        got = set(res.match_rows(i).tolist())
        want = set(np.nonzero(truth[i])[0].tolist())
        assert got == want


def test_knn_finds_same_digit_class(digits):
    """Sanity on semantics, not just mechanics: a digit's nearest
    neighbors should overwhelmingly share its class label."""
    vecs, labels = digits
    rows, d2 = scan_knn(jnp.asarray(vecs), jnp.asarray(vecs[:200]), k=6)
    rows = np.asarray(rows)
    # skip self-match in column 0
    same = np.mean(labels[rows[:, 1:]] == labels[:200, None])
    assert same > 0.9, same


def test_pallas_kernel_on_digits(digits):
    vecs, _ = digits
    # n <= buckets: kernel output must match the oracle exactly
    rows, d2 = pallas_scan_knn(
        jnp.asarray(vecs), jnp.asarray(vecs[:64]), k=5, block=2048,
        buckets=2048,
    )
    erows, _ = exact_knn(jnp.asarray(vecs), jnp.asarray(vecs[:64]), k=5)
    rows, erows = np.asarray(rows), np.asarray(erows)
    for i in range(64):
        assert set(rows[i].tolist()) == set(erows[i].tolist())


def test_memory_index_oracle_on_digits(digits):
    """The reference's own real-data test shape: MemoryVectorIndex over
    normalized records, Find vs plain scan, zero false pos/neg
    (MemoryVectorIndexTests.cs:136-207)."""
    vecs, _ = digits
    sub = vecs[:400]
    idx = MemoryVectorIndex(
        list(range(400)), vector_selector=lambda i: sub[i],
        list_threshold=10,
    )
    assert len(idx) == 400
    rng = np.random.RandomState(0)
    for qi in rng.randint(0, 400, size=8):
        q = sub[qi]
        eps = 1.5
        found = sorted(
            r for r in idx.find(q, eps)
            if float(np.sum((sub[r] - q) ** 2)) <= eps * eps
        )
        truth = sorted(
            int(i)
            for i in np.nonzero(
                np.sum((sub - q) ** 2, axis=1) <= eps * eps
            )[0]
        )
        assert found == truth


def test_radius_calibrated_tree_knn(digits):
    vecs, _ = digits
    idx = build_index_fused(vecs, leaf_size=8)
    qs = vecs[100:116]
    rows, d2 = knn(idx, qs, k=5)  # auto-calibrated radius
    erows, _ = exact_knn(jnp.asarray(vecs), jnp.asarray(qs), k=5)
    rows, erows = np.asarray(rows), np.asarray(erows)
    hits = sum(
        len(set(rows[i].tolist()) & set(erows[i].tolist()))
        for i in range(16)
    )
    assert hits >= 0.9 * 16 * 5


def test_load_arff_empty_data_section(tmp_path):
    p = tmp_path / "empty.arff"
    p.write_text(
        "@relation empty\n"
        "@attribute x numeric\n"
        "@attribute y numeric\n"
        "@attribute class {a,b}\n"
        "@data\n"
    )
    data, names, labels = load_arff(str(p))
    assert data.shape == (0, 2) and names == ["x", "y"]
    assert labels is not None and labels.shape == (0,)
