#!/usr/bin/env python
"""Generate a deep-image-96-angular-SHAPED synthetic HDF5 file.

The reference's headline benchmark ingests deep-image-96-angular
(ann-benchmarks HDF5: float32 ``/train`` + ``/test``, 96-d, rows unit
-normalized — reference Program.cs:70-156). That file is not fetchable
here (no egress), so this writes a structurally identical stand-in:
clustered 96-d vectors, L2-normalized (angular), float32, chunked
datasets — every property the ingest path touches. Drive the full
pipeline with:

    VDB_DATA=/tmp/deep-image-shaped.hdf5 python benchmarks/recall_qps.py \
        --n 1000000 --q 4096 --probes 24,48

Usage: python benchmarks/make_hdf5.py [out.hdf5] [--n 1000000] [--q 10000]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/deep-image-shaped.hdf5")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--q", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import h5py

    rng = np.random.RandomState(args.seed)
    c = max(64, args.n // 1000)
    centers = rng.rand(c, args.d).astype(np.float32) * 2 - 1

    def rows(num, key):
        r = np.random.RandomState(key)
        v = centers[r.randint(0, c, size=num)] + 0.05 * r.randn(
            num, args.d
        ).astype(np.float32)
        # angular: unit rows, like the real deep-image-96-angular
        return (v / np.maximum(
            np.linalg.norm(v, axis=1, keepdims=True), 1e-30
        )).astype(np.float32)

    with h5py.File(args.out, "w") as f:
        # chunked storage like the ann-benchmarks files; written in
        # 100k-row blocks so this generator itself stays O(block) RAM
        tr = f.create_dataset(
            "train", (args.n, args.d), dtype="f4",
            chunks=(min(100_000, args.n), args.d),
        )
        for s in range(0, args.n, 100_000):
            e = min(s + 100_000, args.n)
            tr[s:e] = rows(e - s, args.seed + 1 + s)
        f.create_dataset("test", data=rows(args.q, args.seed + 7), dtype="f4")
    print(f"wrote {args.out}: train=({args.n},{args.d}) test=({args.q},{args.d})")


if __name__ == "__main__":
    main()
