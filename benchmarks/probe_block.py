#!/usr/bin/env python
"""Probe the serving kernel's DMA block size at 10M x 96.

The per-BLOCK epilogue (mantissa-pack encode + accumulator min: ~3 VPU
ops on [qt, m]) amortizes over w = block/buckets column slices, and the
VPU epilogue is co-dominant with the MXU at 10M (CLAUDE.md anatomy), so
doubling the block from 8192 (w=2) to 16384 (w=4) cuts the per-element
epilogue from ~3 to ~2.5 ops. VMEM cost: 2 slots x [128, block] bf16 =
4 MB at 16384 (fits the 96 MB raised limit next to q_tile<=512 tiles).

Prints one JSON line per (block, q_tile) combo. Run alone (never next to
another TPU process).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--blocks", type=str, default="8192,16384,32768")
    ap.add_argument("--q-tiles", type=str, default="512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vector_database_tpu.ops.pallas_knn import (
        pack_database,
        pallas_scan_knn_packed,
    )

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.RandomState(3)
    host = rng.rand(args.n, args.d).astype(np.float32) * 2 - 1
    vecs = jax.device_put(host)
    queries = jnp.asarray(
        rng.rand(args.q, args.d).astype(np.float32) * 2 - 1
    )

    # chained timing: one dispatch round-trip per REPS batches; vary the
    # query input per iteration so identical scan bodies don't get CSE'd
    def timed(pack, q_tile):
        # the pack MUST be a jit ARGUMENT: closure-captured device arrays
        # ship as compile-payload constants (HTTP 413 from the remote
        # compiler at multi-GB scale — CLAUDE.md)
        def chain(pk, qs):
            def step(c, i):
                r, d2 = pallas_scan_knn_packed(
                    pk, qs + 1e-7 * i, k=args.k, q_tile=q_tile
                )
                return c + jnp.float32(jnp.sum(r == 0)), None

            out, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(args.reps)
            )
            return out

        cj = jax.jit(chain)
        float(jnp.sum(cj(pack, queries)))  # compile + warm
        t0 = time.time()
        float(jnp.sum(cj(pack, queries)))
        dt = (time.time() - t0) / args.reps
        return dt

    base = None
    for block in (int(b) for b in args.blocks.split(",")):
        pack = pack_database(vecs, block=block)
        for q_tile in (int(t) for t in args.q_tiles.split(",")):
            dt = timed(pack, q_tile)
            qps = args.q / dt
            rec = {
                "block": block,
                "q_tile": q_tile,
                "batch_ms": round(dt * 1e3, 2),
                "qps": round(qps, 1),
            }
            if base is None:
                base = qps
            rec["vs_8192"] = round(qps / base, 3)
            print(json.dumps(rec), flush=True)
        for b in (pack.vb, pack.vn):
            b.delete()


if __name__ == "__main__":
    main()
