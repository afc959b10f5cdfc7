"""Multi-host / multi-slice scaffolding: virtual slices on the 8-device
CPU mesh (conftest.py forces 8 virtual devices)."""

import numpy as np
import pytest

import jax

from vector_database_tpu import build_index_fused, exact_ball, exact_knn
from vector_database_tpu.parallel import (
    build_index_multislice,
    init_distributed,
    knn_multislice,
    make_slice_meshes,
    search_multislice,
    slice_groups,
)
from vector_database_tpu.utils import datasets


def test_init_distributed_single_process_noop():
    # no coordinator configured -> no-op, callable unconditionally
    assert init_distributed() is False


def test_slice_groups_virtual_partition():
    groups = slice_groups(n_slices=4)
    assert len(groups) == 4
    assert sum(len(g) for g in groups) == len(jax.devices())
    flat = [d for g in groups for d in g]
    assert flat == list(jax.devices())
    with pytest.raises(ValueError):
        slice_groups(n_slices=3)  # 8 devices don't split into 3


def test_make_slice_meshes():
    meshes = make_slice_meshes(2)
    assert len(meshes) == 2
    assert all(m.shape["data"] == 4 for m in meshes)


def test_multislice_knn_matches_oracle():
    vecs = datasets.random_uniform(515, 6, seed=31)  # unaligned n
    msi = build_index_multislice(vecs, n_slices=2, leaf_size=2)
    queries = datasets.random_uniform(9, 6, seed=32)
    rows, d2 = knn_multislice(msi, queries, k=5, radius=1.2)
    erows, ed2 = exact_knn(vecs, queries, k=5)
    assert np.allclose(
        np.sort(d2, 1), np.sort(np.asarray(ed2), 1), rtol=1e-4, atol=1e-5
    )
    # global row ids survive the per-slice offset mapping
    for qi in range(9):
        assert set(rows[qi].tolist()) == set(
            np.asarray(erows)[qi].tolist()
        )


def test_multislice_search_matches_oracle():
    vecs = datasets.random_uniform(300, 5, seed=33)
    msi = build_index_multislice(vecs, n_slices=4, leaf_size=3)
    queries = datasets.random_uniform(7, 5, seed=34)
    rows, d2, cnt, ov = search_multislice(msi, queries, 0.7)
    assert not ov.any()
    truth = np.asarray(exact_ball(vecs, queries, 0.7))
    for qi in range(7):
        got = set(r for r in rows[qi].tolist() if r >= 0)
        assert got == set(np.nonzero(truth[qi])[0].tolist())
    assert np.array_equal(cnt, truth.sum(axis=1))


def test_multislice_trees_match_per_slice_fused():
    # each slice's tree is the fused single-device tree of its row range
    # (bitwise on integer data)
    vecs = np.random.RandomState(35).randint(-3, 4, (256, 4)).astype(
        np.float32
    )
    msi = build_index_multislice(vecs, n_slices=2, leaf_size=2)
    assert msi.offsets == [0, 128]
    for sl, lo, hi in zip(msi.slices, (0, 128), (128, 256)):
        ref = build_index_fused(vecs[lo:hi], leaf_size=2)
        for f in ("dim", "mid", "low", "high"):
            assert np.array_equal(
                np.asarray(getattr(sl, f)), np.asarray(getattr(ref, f))
            )


def test_multislice_rejects_too_few_rows():
    with pytest.raises(ValueError):
        build_index_multislice(
            datasets.random_uniform(1, 4, seed=0), n_slices=2
        )
