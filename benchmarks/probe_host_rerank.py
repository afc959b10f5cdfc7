#!/usr/bin/env python
"""A/B the out-of-core serve stream: host_rerank=True (packed blocks +
norm row only, ~196 B/row at D=96) vs False (adds the f32 rerank matrix,
~580 B/row). The chunk path is transfer-bound through the axon tunnel
(~30 MB/s), so the cut should show almost 1:1 in serve wall-clock.

Prints one JSON line per mode; asserts both modes return the same
neighbor sets.
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
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from vector_database_tpu.out_of_core import ChunkedIndex

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.RandomState(7)
    t0 = time.time()
    ci = ChunkedIndex(leaf_size=16)
    for start in range(0, args.n, args.chunk):
        rows = min(args.chunk, args.n - start)
        ci.add_chunk(rng.rand(rows, args.d).astype(np.float32) * 2 - 1)
    print(json.dumps({"build_s": round(time.time() - t0, 1),
                      "chunks": ci.num_chunks}), flush=True)
    queries = rng.rand(args.q, args.d).astype(np.float32) * 2 - 1

    results = {}
    for mode in (True, False):
        r, d2 = ci.knn(queries, k=args.k, host_rerank=mode)  # warm compile
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            r2, dd2 = ci.knn(queries, k=args.k, host_rerank=mode)
            ts.append(time.time() - t0)
        results[mode] = (r, d2)
        print(json.dumps({
            "host_rerank": mode,
            "serve_s": round(min(ts), 2),
            "qps": round(args.q / min(ts), 1),
        }), flush=True)

    rh, dh = results[True]
    rd, dd = results[False]
    same = sum(
        set(rh[i].tolist()) == set(rd[i].tolist()) for i in range(args.q)
    )
    print(json.dumps({"same_neighbor_sets": f"{same}/{args.q}"}), flush=True)
    assert same == args.q

    # pinned capacity mode: packed blocks resident, host rerank pages
    # candidates — the kernel-rate serving line for > fully-resident
    # database sizes
    ci.pin()
    rp, dp = ci.knn(queries, k=args.k)  # warm (no stream, same program)
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        ci.knn(queries, k=args.k)
        ts.append(time.time() - t0)
    print(json.dumps({
        "pinned": True,
        "serve_s": round(min(ts), 2),
        "qps": round(args.q / min(ts), 1),
    }), flush=True)
    assert all(
        set(rp[i].tolist()) == set(rh[i].tolist()) for i in range(args.q)
    )
    ci.unpin()


if __name__ == "__main__":
    main()
