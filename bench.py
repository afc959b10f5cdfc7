#!/usr/bin/env python
"""Headline benchmark: index build throughput on 96-d vectors.

The reference's only published number is the deep-image-96-angular build —
~10M vectors x 96 dims in ~3 minutes on a laptop (reference README.md:93-100;
BASELINE.md), i.e. ~55.6k vectors/s. This harness builds a 96-d uniform
random index (the deep-image file itself is not fetchable in this
environment) with the fused single-compile builder and reports build
throughput; ``vs_baseline`` is the speedup over the reference's rate.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Environment knobs: VDB_BENCH_N (rows), VDB_BENCH_D (dims),
VDB_BENCH_LEAF (leaf bucket size), VDB_BENCH_TIE=mean_id (the
reference-parity tie-break: exact limb-arithmetic mean-id splits),
VDB_BENCH_SHARDED=1 (build through
the SPMD sharded fused path, ``parallel.build_index_sharded``, over a
mesh of ALL visible devices — the multi-chip/>HBM-per-chip story; on a
single chip it exercises the same program on a 1-device mesh),
VDB_BENCH_INGEST=1 (ingest-inclusive: the timed section starts from a
HOST-resident numpy array and includes the double-buffered host→HBM
stream — the honest end-to-end line; the reference's ~3 min likewise
began after the HDF5 parse but included its store I/O).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    n = int(os.environ.get("VDB_BENCH_N", 10_000_000))
    d = int(os.environ.get("VDB_BENCH_D", 96))
    leaf = int(os.environ.get("VDB_BENCH_LEAF", 16))
    tie = os.environ.get("VDB_BENCH_TIE", "positional")
    sharded = os.environ.get("VDB_BENCH_SHARDED", "") == "1"
    ingest = os.environ.get("VDB_BENCH_INGEST", "") == "1"

    import jax
    import jax.numpy as jnp

    from vector_database_tpu import build_index_fused

    # Generate the dataset on device: the benchmark measures the build, not
    # host->device ingest (the reference's ~3 min likewise excludes the HDF5
    # parse, Program.cs:133-152). The input buffer is donated into the build
    # (the builder permutes it in place), so regenerate per run.
    # VDB_BENCH_INGEST=1 instead starts from a HOST numpy array and times
    # the double-buffered host->HBM stream + build together.
    if ingest:
        from vector_database_tpu.runtime.native_store import (
            stream_rows_to_device,
        )

        def stream_in(host):
            return stream_rows_to_device(
                lambda s, rows: host[s:s + rows], n, d
            )

        def make(seed):
            rng = np.random.RandomState(seed)
            return rng.rand(n, d).astype(np.float32) * 2.0 - 1.0
    else:
        def make(seed):
            v = (
                jax.random.uniform(
                    jax.random.PRNGKey(seed), (n, d), jnp.float32
                )
                * 2.0 - 1.0
            )
            # block_until_ready does NOT synchronize through the axon
            # tunnel — force a (tiny) transfer so the timed window
            # below can't absorb the on-device generation
            np.asarray(v[:1, :1])
            return v

    def drop(idx):
        for buf in (idx.vectors, idx.orig_row, idx.dim, idx.mid, idx.low,
                    idx.high, idx.leaf_start, idx.leaf_count):
            buf.delete()

    if sharded:
        from vector_database_tpu.parallel import build_index_sharded, make_mesh

        mesh = make_mesh()

        def build(vecs):
            return build_index_sharded(
                vecs, mesh, leaf_size=leaf, donate=True, tie_break=tie
            )
    else:
        def build(vecs):
            return build_index_fused(
                vecs, leaf_size=leaf, donate=True, tie_break=tie
            )

    if ingest:
        base_build = build

        def build(host):
            return base_build(stream_in(host))

    # Warm-up: compile the build program; free its outputs before the
    # timed run (at 10M the index's vector copy is ~5G of HBM).
    idx = build(make(0))
    np.asarray(idx.orig_row[:1])
    drop(idx)

    # best of two timed builds: wall time through a tunneled device is
    # vulnerable to transient contention
    dt = float("inf")
    for seed in (1, 2):
        vecs = make(seed)
        t0 = time.time()
        idx = build(vecs)
        np.asarray(idx.orig_row[:1])  # full materialization barrier
        dt = min(dt, time.time() - t0)
        drop(idx)

    reference_rate = 10_000_000 / 180.0  # README.md:93-100
    rate = n / dt
    tag = ("_sharded" if sharded else "") + ("_ingest" if ingest else "")
    print(json.dumps({
        "metric": f"index_build_throughput_{d}d_n{n}_leaf{leaf}{tag}",
        "value": round(rate, 1),
        "unit": "vectors/s",
        "vs_baseline": round(rate / reference_rate, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
