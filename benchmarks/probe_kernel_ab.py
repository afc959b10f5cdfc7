"""A/B microbenchmark of pallas_knn kernel internals on real TPU.

Modes: full = production kernel; noepi = dot + min only (no pack ops);
nodot = epilogue on broadcast data (no MXU); dmaonly = stream only.
Used to attribute per-block time between DMA, MXU, and VPU epilogue.
"""
import sys
import time
import json
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
modes = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "full", "noepi", "nodot", "dmaonly"
]
D, Q, REPS = 96, 1024, 20
block, q_tile, m, bits = 8192, 256, 2048, 12


def make(mode):
    def kern(qn_ref, vn_hbm, v_hbm, q_ref, out_hbm, vbuf, vnbuf, acc_ref,
             sem, osem, *, nb):
        qt = q_ref.shape[0]
        w = block // m
        keep = jnp.int32(~((1 << bits) - 1))
        t = pl.program_id(0)
        dma_v = lambda s, b: pltpu.make_async_copy(
            v_hbm.at[b], vbuf.at[s], sem.at[s, 0])
        dma_vn = lambda s, b: pltpu.make_async_copy(
            vn_hbm.at[b], vnbuf.at[s], sem.at[s, 1])
        dma_v(0, 0).start()
        dma_vn(0, 0).start()
        qn_col = qn_ref[:]
        acc_ref[:] = jnp.full((qt, m), jnp.int32(2**31 - 1))

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            nxt = jax.lax.rem(b + 1, 2)

            @pl.when(b + 1 < nb)
            def _():
                dma_v(nxt, b + 1).start()
                dma_vn(nxt, b + 1).start()

            dma_v(slot, b).wait()
            dma_vn(slot, b).wait()
            vn_row = vnbuf[slot, 0]
            vn2 = vnbuf[slot]  # [1, block] 2D view
            acc = acc_ref[:]
            if mode == "dmaonly":
                # consume the buffers so the DMAs aren't dead-code'd
                acc_ref[:] = jnp.minimum(
                    acc, pltpu.bitcast(
                        jnp.broadcast_to(vn2[:, :m], (qt, m)), jnp.int32))
                return 0
            for j in range(w):
                if mode == "nodot":
                    sl = jnp.broadcast_to(
                        vn2[:, j * m:(j + 1) * m], (qt, m)
                    ) * 1.0001
                else:
                    sl = jax.lax.dot_general(
                        q_ref[:], vbuf[slot][:, j * m:(j + 1) * m],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if mode == "noepi":
                    acc = jnp.minimum(acc, pltpu.bitcast(sl, jnp.int32))
                else:
                    d2s = (vn_row[j * m:(j + 1) * m][None, :] - 2.0 * sl
                           ) + qn_col
                    encs = (pltpu.bitcast(d2s, jnp.int32) & keep) | (
                        b * w + j)
                    acc = jnp.minimum(acc, encs)
            acc_ref[:] = acc
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        cp = pltpu.make_async_copy(acc_ref, out_hbm.at[t], osem)
        cp.start()
        cp.wait()

    return kern


def run(mode, vb, vn, qb, qn):
    n_pad = vb.shape[0] * block
    nb = n_pad // block
    q_pad = qb.shape[0]
    qt_blocks = q_pad // q_tile
    d_pad = qb.shape[1]
    return pl.pallas_call(
        functools.partial(make(mode), nb=nb),
        grid=(qt_blocks,),
        in_specs=[
            pl.BlockSpec((q_tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((q_tile, d_pad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((qt_blocks, q_tile, m), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, block), jnp.bfloat16),
            pltpu.VMEM((2, 1, block), jnp.float32),
            pltpu.VMEM((q_tile, m), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(qn, vn, vb, qb)


def main():
    print("device:", jax.devices()[0])
    d_pad = 128
    n_pad = ((N + block - 1) // block) * block
    nb = n_pad // block
    key = jax.random.PRNGKey(0)
    vb = jax.random.normal(key, (nb, d_pad, block), jnp.bfloat16)
    vn = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(1), (nb, 1, block), jnp.float32))
    qb = jax.random.normal(jax.random.PRNGKey(2), (Q, d_pad), jnp.bfloat16)
    qn = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(3), (Q, 1), jnp.float32))

    for mode in modes:
        fn = jax.jit(functools.partial(run, mode))
        out = fn(vb, vn, qb, qn)
        float(jnp.sum(out[0, 0, :8]))  # sync through the tunnel

        qstack = jnp.broadcast_to(qb, (REPS, *qb.shape))

        @jax.jit
        def chained(vb, vn, qstack, qn):
            def body(c, qs):
                o = fn(vb, vn, qs, qn)
                return c + o[0, 0, 0], None
            acc, _ = jax.lax.scan(body, jnp.int32(0), qstack)
            return acc

        int(chained(vb, vn, qstack, qn))
        t0 = time.time()
        int(chained(vb, vn, qstack, qn))
        dt = (time.time() - t0) / REPS
        per_iter = dt / (nb * (Q // q_tile)) * 1e6
        print(json.dumps({
            "mode": mode, "ms_per_1024q": round(dt * 1000, 2),
            "us_per_tile_block": round(per_iter, 2),
            "qps": round(Q / dt),
        }))


if __name__ == "__main__":
    main()
