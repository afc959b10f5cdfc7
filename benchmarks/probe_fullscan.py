#!/usr/bin/env python
"""Full-scan kernel config sweep: attack the 58k-vs-77k/chip gap.

Round-3 verdict #4: 10M x 96 full-scan serving sits at ~58k QPS vs the
~77k bf16 MXU cycle floor. Per-scored-element VPU accounting of
``_kernel`` (block=8192, m=4096, w=2):

  d2c add 1.0 + slice min 0.5 + id-encode 2*m/block + acc min 0.5*m/block
  = ~3.0 VPU ops/element

The MXU needs ~1.3 TFLOP per 512-query tile (6.7 ms) while 3.0 VPU
ops/element cost ~4 ms — close enough that imperfect MXU/VPU overlap
shows up as the observed gap. ``block`` and ``m`` (buckets) move the
epilogue terms: w = block/m, id-encode and acc-min scale with m/block,
the bucket top_k scales with m, and the exact-rerank width scales with
k_scan * w. This sweep measures QPS + recall@10 across (block, m,
q_tile, oversample) on clustered 10M x 96 — the same protocol as
bench.py serving certification.

Usage: python benchmarks/probe_fullscan.py [--n 10000000]
  [--configs "8192:4096:512:4,16384:4096:512:2,..."]  (block:m:q_tile:os)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = "8192:4096:512:4,16384:4096:512:4,16384:4096:512:2," \
          "8192:2048:512:4,32768:4096:512:2,8192:4096:384:4"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--truth-q", type=int, default=1024)
    ap.add_argument("--configs", type=str, default=DEFAULT)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke-testing while the TPU is busy)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vector_database_tpu import build_index_fused, exact_knn
    from vector_database_tpu.ops.pallas_knn import (
        pack_database,
        pallas_scan_knn_packed,
    )

    n, d, k, q = args.n, args.d, args.k, args.q
    c = max(64, n // 1000)
    centers = (
        jax.random.uniform(jax.random.PRNGKey(10), (c, d), jnp.float32)
        * 2 - 1
    )
    assign = jax.random.randint(jax.random.PRNGKey(11), (n,), 0, c)
    train = centers[assign] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(12), (n, d), jnp.float32
    )
    test = centers[
        jax.random.randint(jax.random.PRNGKey(13), (q,), 0, c)
    ] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(14), (q, d), jnp.float32
    )
    test = jnp.asarray(np.asarray(test))
    np.asarray(test[:1, :1])
    index = build_index_fused(train, leaf_size=16, donate=True)
    for buf in (index.orig_row, index.dim, index.mid, index.low,
                index.high, index.leaf_start, index.leaf_count):
        buf.delete()
    vectors = index.vectors

    tq = args.truth_q
    truth = np.asarray(exact_knn(vectors, test[:tq], k=k)[0])
    want = [set(r.tolist()) for r in truth]
    denom = max(1, sum(len(w) for w in want))

    def recall(rows):
        rows = np.asarray(rows)[:tq]
        return sum(
            len(set(rows[i].tolist()) & want[i])
            for i in range(len(want))
        ) / denom

    qstack = jnp.broadcast_to(test, (args.reps, *test.shape))
    pack = None
    for cfg in args.configs.split(","):
        block, m, q_tile, os_ = (int(x) for x in cfg.split(":"))
        if pack is not None:
            # serialize HBM residency: drop the previous pack first
            pack.vb.delete()
            pack.vn.delete()
            if pack.cent is not None:
                pack.cent.delete()
                pack.rad.delete()
        t0 = time.time()
        pack = pack_database(vectors, block=block, buckets=m)
        np.asarray(pack.vn[:1, :, :1])
        pack_s = time.time() - t0

        @jax.jit
        def chained(pk, qs):
            def body(carry, batch):
                rows, _ = pallas_scan_knn_packed(
                    pk, batch, k=k, q_tile=q_tile, oversample=os_
                )
                return carry + jnp.sum(rows).astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return acc

        try:
            float(chained(pack, qstack))  # compile + warm
            t0 = time.time()
            float(chained(pack, qstack))
            qps = q * args.reps / (time.time() - t0)
            rows, _ = pallas_scan_knn_packed(
                pack, test, k=k, q_tile=q_tile, oversample=os_
            )
            rec = recall(rows)
            print(json.dumps({
                "block": block, "m": m, "q_tile": q_tile,
                "oversample": os_, "w": block // m,
                "pack_s": round(pack_s, 2),
                "qps": round(qps), "us_per_q": round(1e6 * 1 / qps, 2),
                "recall": round(rec, 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "block": block, "m": m, "q_tile": q_tile,
                "oversample": os_,
                "error": f"{type(e).__name__}: {e}"[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
