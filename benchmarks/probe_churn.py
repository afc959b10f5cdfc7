#!/usr/bin/env python
"""DynamicIndex mutate+serve steady state: when does packed serving win?

Round-3 verdict weak/next #9: ``DynamicIndex.knn(packed=True)`` repacks
the live view once per mutation epoch; under churn that repack competes
with the default exact scan (no per-epoch cost, slower per batch). The
crossover is a three-number story, measured here on the real device:

  t_repack  — first packed knn() after a mutation (serve-view rebuild +
              pack_database + one batch)
  t_packed  — steady packed batch (same epoch)
  t_scan    — steady exact-scan batch (the default path; also pays a
              serve-view rebuild after a mutation, measured separately)

Packed serving wins an epoch of T batches when
  t_repack - t_scan_first + T * t_packed < T * t_scan
  =>  T > (t_repack - t_scan_first) / (t_scan - t_packed).

Prints one JSON line per database size with the measured numbers and the
derived crossover T.

Usage: python benchmarks/probe_churn.py [--sizes 1000000,10000000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="1000000")
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from vector_database_tpu.dynamic import DynamicIndex

    dyn = None
    for n in (int(x) for x in args.sizes.split(",")):
        if dyn is not None:
            # free the previous size's device residents (index, serve
            # view, pack) BEFORE allocating the next — at 10M the build
            # needs nearly the whole chip
            dyn._invalidate_serve()
            if dyn._index is not None:
                for buf in (dyn._index.vectors, dyn._index.orig_row,
                            dyn._index.dim, dyn._index.mid,
                            dyn._index.low, dyn._index.high,
                            dyn._index.leaf_start, dyn._index.leaf_count):
                    buf.delete()
            dyn = None
        rng = np.random.RandomState(0)
        base = rng.rand(n, args.d).astype(np.float32) * 2 - 1
        queries = rng.rand(args.q, args.d).astype(np.float32) * 2 - 1
        dyn = DynamicIndex(base, leaf_size=16)
        del base
        # one delta row on top of a compacted main: the serve view takes
        # the DEVICE fast path (main matrix concat + tiny delta) and its
        # shape stays [n+1, D] across epochs, so every epoch shares the
        # compiled programs. Each "mutation epoch" is then simulated by
        # invalidating the cached view+pack — exactly the state add()
        # leaves behind (remove-churn additionally pays a device->host
        # matrix round-trip on THIS tunneled rig, ~30 MB/s — a
        # documented environment cost, not a design cost; see
        # dynamic.py _serve_view).
        dyn.compact()
        dyn.add(rng.rand(1, args.d).astype(np.float32) * 2 - 1)

        def mutate():
            dyn._invalidate_serve()

        def timed(fn, reps):
            fn()  # compile/warm for this epoch's shapes
            t0 = time.time()
            for _ in range(reps):
                fn()
            return (time.time() - t0) / reps

        # steady exact-scan batch + its first-after-mutation cost
        dyn.knn(queries, k=args.k)  # compile
        t_scan = timed(lambda: dyn.knn(queries, k=args.k), args.reps)
        mutate()
        t0 = time.time()
        dyn.knn(queries, k=args.k)
        t_scan_first = time.time() - t0  # compiled: serve-view rebuild

        # packed: first call after mutation pays rebuild + pack
        dyn.knn(queries, k=args.k, exact=False, packed=True)  # compile
        t_packed = timed(
            lambda: dyn.knn(queries, k=args.k, exact=False, packed=True),
            args.reps,
        )
        mutate()
        t0 = time.time()
        dyn.knn(queries, k=args.k, exact=False, packed=True)
        t_repack = time.time() - t0  # compiled: rebuild + pack + batch

        denom = t_scan - t_packed
        crossover = (
            (t_repack - t_scan_first) / denom if denom > 0 else None
        )
        print(json.dumps({
            "n": n,
            "q": args.q,
            "t_scan_batch_s": round(t_scan, 4),
            "t_scan_first_after_mutation_s": round(t_scan_first, 4),
            "t_packed_batch_s": round(t_packed, 4),
            "t_packed_first_after_mutation_s": round(t_repack, 4),
            "scan_qps": round(args.q / t_scan),
            "packed_qps": round(args.q / t_packed),
            "crossover_batches_per_epoch": (
                round(crossover, 2) if crossover is not None else None
            ),
            "device": str(jax.devices()[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
