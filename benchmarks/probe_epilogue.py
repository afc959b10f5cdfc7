#!/usr/bin/env python
"""Decompose the packed-scan serving pipeline's per-batch cost on TPU.

Motivation (measured, 1M x 96, q=4096, hardware): pruned-scan QPS
plateaus at ~250k regardless of probes — solving across probes points
gives kernel stream ~1.2 us/q at full 1M coverage vs ~3.8 us/q of FIXED
per-batch cost. This probe times the candidates separately:

  - kernel-only   (the pallas scan, no epilogue)
  - bucket top-k  (lax.top_k(k_scan) over the [Q, m] accumulator)
  - approx top-k  (lax.approx_max_k — the TPU PartialReduce op)
  - rerank        (the [Q, k_scan*w, D] gather + exact f32 rerank)
  - selection     (the pruned mode's block-ranking prologue)

Each piece is timed as REPS chained iterations inside ONE jit (29 ms
dispatch through the axon tunnel otherwise swamps everything), with a
varying input per iteration so identical bodies don't CSE away.

Usage: python benchmarks/probe_epilogue.py [--n 1000000] [--q 4096]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=20):
    """Chained wall time per iteration: jit(scan over perturbed inputs)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(carry, t):
            out = fn(*a, carry, t)
            return out, None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(reps, dtype=jnp.int32)
        )
        return acc

    float(chained(*args))  # compile + warm
    t0 = time.time()
    float(chained(*args))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vector_database_tpu import pack_database
    from vector_database_tpu.ops import pallas_knn as pk

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(args.n, args.d).astype(np.float32) * 2 - 1)
    qs = jnp.asarray(rng.rand(args.q, args.d).astype(np.float32) * 2 - 1)
    pack = pack_database(v)
    nb, m, block = pack.vb.shape[0], pack.m, pack.block
    w = block // m
    k_scan = min(args.k * 4, m)
    q_tile = 512
    out = {"n": args.n, "q": args.q, "nb": nb, "m": m,
           "k_scan": k_scan, "reps": args.reps}

    # ---- full pipeline (reference point) ----
    def full(p, queries, carry, t):
        rows, d2 = pk.pallas_scan_knn_packed(
            p, queries + t * 1e-6, k=args.k, q_tile=q_tile
        )
        return carry + jnp.float32(jnp.sum(rows))

    out["full_us_per_q"] = timed(full, pack, qs, reps=args.reps) / args.q * 1e6

    # ---- kernel only: the pallas call, sum its accumulator ----
    q_pad = ((args.q + q_tile - 1) // q_tile) * q_tile
    d_pad = pack.vb.shape[1]
    qt_blocks = q_pad // q_tile

    def kernel_only(vn, vb, queries, carry, t):
        qp = jnp.pad(queries + t * 1e-6,
                     ((0, q_pad - args.q), (0, d_pad - args.d)))
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        acc = pl.pallas_call(
            functools.partial(
                pk._kernel, nb=nb, block=block, m=m, bits=pack.bits
            ),
            grid=(qt_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((q_tile, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (qt_blocks, q_tile, m), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((2, d_pad, block), pack.vb.dtype),
                pltpu.VMEM((2, 1, block), jnp.float32),
                pltpu.VMEM((q_tile, m), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            ),
            interpret=jax.default_backend() != "tpu",
        )(vn, vb, qp.astype(jnp.bfloat16))
        return carry + jnp.sum(acc[0, 0, :8])

    out["kernel_us_per_q"] = (
        timed(kernel_only, pack.vn, pack.vb, qs, reps=args.reps)
        / args.q * 1e6
    )

    # ---- bucket top-k over the [Q, m] accumulator ----
    acc0 = jnp.asarray(rng.rand(args.q, m).astype(np.float32))

    def bucket_topk(a, carry, t):
        neg, pos = jax.lax.top_k(-(a + t * 1e-9), k_scan)
        return carry + jnp.float32(jnp.sum(pos[:, 0]))

    out["bucket_topk_us_per_q"] = (
        timed(bucket_topk, acc0, reps=args.reps) / args.q * 1e6
    )

    def bucket_approx(a, carry, t):
        neg, pos = jax.lax.approx_max_k(
            -(a + t * 1e-9), k_scan, recall_target=0.95
        )
        return carry + jnp.float32(jnp.sum(pos[:, 0]))

    out["bucket_approx_us_per_q"] = (
        timed(bucket_approx, acc0, reps=args.reps) / args.q * 1e6
    )

    # ---- shortlist rerank: gather + exact f32 + final top-k ----
    short0 = jnp.asarray(
        rng.randint(0, args.n, size=(args.q, k_scan * w)).astype(np.int32)
    )

    def rerank(vecs, queries, short, carry, t):
        safe = jnp.clip(short + t * 0, 0, args.n - 1)
        cand = vecs[safe]
        diff = cand - (queries[:, None, :] + t * 1e-6)
        key = jnp.sum(diff * diff, axis=-1)
        fneg, fpos = jax.lax.top_k(-key, args.k)
        return carry + jnp.float32(jnp.sum(fpos[:, 0]))

    out["rerank_us_per_q"] = (
        timed(rerank, v, qs, short0, reps=args.reps) / args.q * 1e6
    )

    # ---- pruned-mode selection prologue (key matmul + sorts) ----
    if pack.cent is not None:
        cent, rad = pack.cent, pack.rad

        def selection(c, r, queries, carry, t):
            qp2 = queries + t * 1e-6
            dots = jax.lax.dot_general(
                qp2.astype(jnp.bfloat16), c.astype(jnp.bfloat16).T,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cc = jnp.sum(c * c, axis=1)
            key = cc[None, :] - 2.0 * dots
            key = jnp.where(r[None, :] < -1e38, jnp.inf, key)
            cpb = c.shape[0] // nb
            key = key.reshape(args.q, nb, cpb).min(axis=2)
            top1 = jnp.argmin(key, axis=1)
            order = jnp.argsort(top1)
            inv = jnp.argsort(order)
            return carry + jnp.float32(jnp.sum(inv[:8]))

        out["selection_us_per_q"] = (
            timed(selection, cent, rad, qs, reps=args.reps)
            / args.q * 1e6
        )

    for key in list(out):
        if key.endswith("_us_per_q"):
            out[key] = round(out[key], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
