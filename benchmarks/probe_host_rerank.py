"""Microbenchmark of the out-of-core host rerank (_host_rerank) — the
measured floor of the pinned capacity mode once the device side is
pipelined (probe_pin_pipeline.py: both modes sit at the host-rerank
floor). Pure host numpy; run with nothing else on the core.

Variants:
  diff      — current production: cand-qh materialized, einsum square
  inplace   — cand -= qh in place (no second [Q,C,D] allocation)
  dot32     — |c|^2 - 2 q.c + |q|^2, f32 (FASTER but not exact: ~1e-4
              abs error at O(1) data — breaks the exact-rerank contract,
              e.g. self-match d2 < 1e-6 asserts; measured for the record)
  dot64     — same with f64 accumulation (exact enough, but upcast cost)

Usage: python benchmarks/probe_host_rerank.py [--q 4096] [--c 80]
           [--d 96] [--n 500000] [--reps 5]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--c", type=int, default=80)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.RandomState(3)
    vec = rng.randn(args.n, args.d).astype(np.float32)
    qh = rng.randn(args.q, args.d).astype(np.float32)
    safe = rng.randint(0, args.n, size=(args.q, args.c))
    n2 = np.einsum("nd,nd->n", vec, vec)
    q2 = np.einsum("qd,qd->q", qh, qh)

    def diff():
        cand = vec[safe]
        d = cand - qh[:, None, :]
        return np.einsum("qcd,qcd->qc", d, d)

    def inplace():
        cand = vec[safe]
        cand -= qh[:, None, :]
        return np.einsum("qcd,qcd->qc", cand, cand)

    def dot32():
        cand = vec[safe]
        return (
            n2[safe] - 2.0 * np.einsum("qcd,qd->qc", cand, qh)
            + q2[:, None]
        )

    def dot64():
        cand = vec[safe]
        return (
            n2[safe].astype(np.float64)
            - 2.0 * np.einsum(
                "qcd,qd->qc", cand, qh, dtype=np.float64
            )
            + q2[:, None]
        ).astype(np.float32)

    ref = diff()
    out = {}
    for name, fn in (("diff", diff), ("inplace", inplace),
                     ("dot32", dot32), ("dot64", dot64)):
        fn()  # warm
        t0 = time.time()
        for _ in range(args.reps):
            key = fn()
        ms = (time.time() - t0) / args.reps * 1e3
        err = float(np.abs(key - ref).max())
        out[name] = {"ms_per_chunk": round(ms, 1),
                     "max_abs_err_vs_diff": round(err, 8)}
        print(json.dumps({name: out[name]}), flush=True)
    # also time the gather alone (lower bound shared by every variant)
    t0 = time.time()
    for _ in range(args.reps):
        vec[safe]
    print(json.dumps({"gather_only_ms": round(
        (time.time() - t0) / args.reps * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
