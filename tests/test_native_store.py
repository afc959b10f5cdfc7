"""Native (C++ mmap) vector store tests: roundtrips, growth, persistence,
fvecs import, and the chunked device-ingest path feeding a build."""

import os
import struct

import numpy as np
import pytest

from vector_database_tpu.runtime.native_store import NativeVectorStore
from vector_database_tpu.utils import datasets


def test_create_append_read(tmp_path):
    path = str(tmp_path / "v.store")
    with NativeVectorStore.create(path, dims=8) as store:
        data = datasets.random_uniform(100, 8, seed=70)
        store.append(data)
        assert len(store) == 100
        np.testing.assert_array_equal(store.read(0, 100), data)
        # zero-copy view agrees with copying read
        np.testing.assert_array_equal(store.rows(10, 5), data[10:15])


def test_growth_beyond_capacity(tmp_path):
    path = str(tmp_path / "v.store")
    with NativeVectorStore.create(path, dims=4, capacity_rows=8) as store:
        for i in range(40):  # force several remaps
            store.append(np.full((7, 4), float(i), np.float32))
        assert len(store) == 280
        np.testing.assert_array_equal(
            store.read(273, 7), np.full((7, 4), 39.0, np.float32)
        )


def test_persistence(tmp_path):
    path = str(tmp_path / "v.store")
    data = datasets.random_uniform(50, 6, seed=71)
    with NativeVectorStore.create(path, dims=6) as store:
        store.append(data)
        store.flush()
    with NativeVectorStore.open(path) as store:
        assert len(store) == 50 and store.dims == 6
        np.testing.assert_array_equal(store.read(0, 50), data)


def test_append_dim_mismatch(tmp_path):
    with NativeVectorStore.create(str(tmp_path / "v"), dims=4) as store:
        with pytest.raises(ValueError):
            store.append(np.zeros((2, 5), np.float32))


def test_read_out_of_bounds(tmp_path):
    with NativeVectorStore.create(str(tmp_path / "v"), dims=4) as store:
        store.append(np.zeros((3, 4), np.float32))
        with pytest.raises(IndexError):
            store.read(2, 5)
        with pytest.raises(IndexError):
            store.rows(4, 1)


def test_import_fvecs(tmp_path):
    # write a small fvecs file (int32 dim + dim float32 per row)
    data = datasets.random_uniform(20, 5, seed=72)
    fpath = str(tmp_path / "base.fvecs")
    with open(fpath, "wb") as f:
        for row in data:
            f.write(struct.pack("<i", 5))
            f.write(row.astype("<f4").tobytes())
    with NativeVectorStore.create(str(tmp_path / "v"), dims=5) as store:
        assert store.import_fvecs(fpath) == 20
        np.testing.assert_array_equal(store.read(0, 20), data)


def test_import_fvecs_dim_mismatch(tmp_path):
    fpath = str(tmp_path / "bad.fvecs")
    with open(fpath, "wb") as f:
        f.write(struct.pack("<i", 3))
        f.write(np.zeros(3, "<f4").tobytes())
    with NativeVectorStore.create(str(tmp_path / "v"), dims=5) as store:
        with pytest.raises(OSError):
            store.import_fvecs(fpath)


def test_chunked_device_ingest_feeds_build(tmp_path):
    from vector_database_tpu import build_index_fused, exact_ball, search

    data = datasets.random_uniform(1200, 8, seed=73)
    path = str(tmp_path / "v.store")
    with NativeVectorStore.create(path, dims=8) as store:
        store.append(data)
        device_matrix = store.to_device(chunk_rows=500)
        assert device_matrix.shape == (1200, 8)
        index = build_index_fused(device_matrix, leaf_size=4)
        queries = data[:4]
        res = search(index, queries, 0.5)
        truth = np.asarray(exact_ball(data, queries, 0.5))
        for qi in range(4):
            assert set(res.match_rows(qi).tolist()) == set(
                np.nonzero(truth[qi])[0].tolist()
            )


def test_open_corrupt_store_errors_not_crashes(tmp_path):
    """A truncated/corrupted store must raise OSError from open(), not
    SIGBUS later on read — and failed opens must not leak the handle."""
    import pytest

    path = str(tmp_path / "s.vstore")
    st = NativeVectorStore.create(path, dims=4, capacity_rows=8)
    st.append(np.ones((6, 4), np.float32))
    st.close()
    # truncate into the data region: header claims 6 rows x 4 dims
    with open(path, "r+b") as f:
        f.truncate(64 + 3 * 4 * 4)  # header + 3 rows
    with pytest.raises(OSError):
        NativeVectorStore.open(path)
    # header-only file
    with open(path, "r+b") as f:
        f.truncate(64)
    with pytest.raises(OSError):
        NativeVectorStore.open(path)
    # repeated failed opens must not leak fds
    import os

    fd_dir = "/proc/self/fd"
    before = len(os.listdir(fd_dir))
    for _ in range(32):
        with pytest.raises(OSError):
            NativeVectorStore.open(path)
    assert len(os.listdir(fd_dir)) <= before + 1


def test_use_after_close_raises(tmp_path):
    """A closed store must raise a Python exception, never reach the FFI
    (a NULL struct pointer would SIGSEGV the process)."""
    path = str(tmp_path / "uac.vstore")
    st = NativeVectorStore.create(path, dims=4)
    st.append(np.ones((2, 4), np.float32))
    st.close()
    for call in (
        lambda: len(st),
        lambda: st.dims,
        lambda: st.append(np.ones((1, 4), np.float32)),
        lambda: st.rows(0, 1),
        lambda: st.read(0, 1),
        lambda: st.flush(),
        lambda: st.import_fvecs(path),
    ):
        with pytest.raises(ValueError, match="closed"):
            call()
    st.close()  # idempotent


def test_import_fvecs_rolls_back_on_error(tmp_path):
    """A mid-file import error must rewind the row count — a retried
    import would otherwise duplicate the first half of the file."""
    import struct

    good = tmp_path / "good.fvecs"
    rows = np.arange(12, dtype=np.float32).reshape(3, 4)
    with open(good, "wb") as f:
        for r in rows:
            f.write(struct.pack("<i", 4))
            f.write(r.tobytes())
    bad = tmp_path / "bad.fvecs"
    with open(bad, "wb") as f:
        f.write(good.read_bytes()[:-8])  # truncate the final row

    path = str(tmp_path / "rb.vstore")
    st = NativeVectorStore.create(path, dims=4)
    st.append(np.full((2, 4), 7.0, np.float32))
    with pytest.raises(OSError, match="truncated"):
        st.import_fvecs(str(bad))
    assert len(st) == 2  # nothing from the failed import remains
    assert st.import_fvecs(str(good)) == 3
    assert len(st) == 5
    np.testing.assert_array_equal(st.read(2, 3), rows)
    st.close()
