"""Dataset utilities: fixtures and chunked HDF5 ingest."""

import numpy as np
import pytest

from vector_database_tpu.utils import datasets


def test_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "ds.hdf5")
    train = datasets.random_uniform(250, 6, seed=150)
    test = datasets.random_uniform(40, 6, seed=151)
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=train)
        f.create_dataset("test", data=test)

    assert datasets.hdf5_size(path, "/train") == (250, 6)
    parts = list(datasets.load_hdf5(path, "/train", chunk=100))
    assert [p[0] for p in parts] == [0, 100, 200]
    np.testing.assert_array_equal(np.concatenate([c for _, c in parts]),
                                  train)


def test_hdf5_bad_rank(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "bad.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=np.zeros((4, 3, 2), np.float32))
    with pytest.raises(ValueError):
        datasets.hdf5_size(path, "/train")


def test_grid_fixture_shapes():
    g = datasets.grid2d(10)
    assert g.shape == (100, 2)
    assert g.min() >= -1 and g.max() <= 1
    ng = datasets.grid2d_not_normalized(10)
    assert ng.max() > 1  # deliberately outside [-1, 1]
    oh = datasets.one_hot_crafted(16)
    assert (oh.sum(1) == 1).all()


def test_load_vectors_csv(tmp_path):
    """The reference harness's ID|Vector dataset export round-trips —
    both header spellings (Program.cs:95 vs :118) parse."""
    vecs = datasets.random_uniform(7, 3, seed=5)
    for header in ("ID|Vector", "ID,Vector"):
        path = tmp_path / f"{header[2]}.csv"
        with open(path, "w") as f:
            f.write(header + "\n")
            for i, v in enumerate(vecs):
                f.write(f"{i + 100}|{','.join(str(x) for x in v)}\n")
        ids, out = datasets.load_vectors_csv(str(path))
        np.testing.assert_array_equal(ids, np.arange(7) + 100)
        np.testing.assert_allclose(out, vecs, rtol=1e-6)

    with pytest.raises(ValueError):
        empty = tmp_path / "empty.csv"
        empty.write_text("ID,Vector\n")
        datasets.load_vectors_csv(str(empty))


def test_load_vectors_csv_rejects_corruption(tmp_path):
    """Malformed rows past the single header line raise instead of being
    silently dropped (which would shift id/row alignment), and an
    unparseable float element raises instead of truncating the vector."""
    p = tmp_path / "trunc.csv"
    p.write_text("ID|Vector\n0|0.1,0.2\n1|0.3,0.4\npartial-flush\n")
    with pytest.raises(ValueError, match="malformed row"):
        datasets.load_vectors_csv(str(p))

    p2 = tmp_path / "junk.csv"
    p2.write_text("ID|Vector\n0|0.1,junk,0.3\n")
    with pytest.raises(ValueError, match="unparseable"):
        datasets.load_vectors_csv(str(p2))

    # locale-formatted floats ('0,5') parse as the wrong width -> the
    # ragged stack raises rather than returning garbage
    p3 = tmp_path / "locale.csv"
    p3.write_text("ID|Vector\n0|0,5,1,5\n1|2,5\n")
    with pytest.raises(ValueError):
        datasets.load_vectors_csv(str(p3))
