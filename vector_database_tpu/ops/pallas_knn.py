"""Pallas fused k-NN scan kernel — the serving-QPS hot path.

The XLA-composed scan (``ops/scan_knn.py``) round-trips each block's
``[Q, B]`` distance matrix through HBM; a naive Pallas grid (one step per
database block) is dominated by ~35μs/step grid overhead. This kernel uses
the double-buffered DMA pipeline pattern instead: ONE grid step per query
tile streams the whole database through VMEM with async copies, so the MXU
distance matmul, the VPU bucket-min shortlist, and the HBM traffic overlap:

  grid = (query_tiles,)
  per step: fori over database blocks b:
      prefetch block b+1 (async DMA HBM->VMEM)
      scores  = Q_tile @ V_b.T        (MXU, bf16 x bf16 -> f32)
      d2      = |v|^2 - 2*scores      (VPU, in VMEM)
      per 128-wide bucket: (min, argmin) packed into one uint32
        (argmin < 128 fits the low 7 mantissa bits; the ≤2^-17 relative
         perturbation of the shortlist *selection* score is irrelevant —
         final distances come from the f32 rerank)

HBM traffic: V once per query tile (bf16) + tiny shortlists.

The exact top-k and the f32 rerank of the shortlist run outside the kernel.
Recall is governed by bucket count exactly as in ``scan_knn``: a true
neighbor is lost only when two of the true top-k collide in one bucket.

On non-TPU backends the kernel runs in interpret mode (the test double —
the ``MemoryRangeStore`` vs ``FileRangeStore`` seam of the reference,
reborn for kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ARG_BITS = 7  # in-bucket index bits -> block <= buckets * 128
_ARG_MASK = (1 << _ARG_BITS) - 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(c_ref, vn_hbm, v_hbm, q_ref, out_hbm, vbuf, vnbuf, ostage,
            sem, osem, *, nb, block, m):
    qt = q_ref.shape[0]
    w = block // m  # in-bucket width (encoded in the low mantissa bits)
    t = pl.program_id(0)

    def dma_v(slot, b):
        return pltpu.make_async_copy(
            v_hbm.at[b], vbuf.at[slot], sem.at[slot, 0]
        )

    def dma_vn(slot, b):
        return pltpu.make_async_copy(
            vn_hbm.at[b], vnbuf.at[slot], sem.at[slot, 1]
        )

    # shortlists stream back to HBM (keeping the [nb, QT, m] output out of
    # VMEM frees room for a 256-row query tile — the MXU runs ~3x faster
    # at M=256 than at M=64)
    def dma_out(slot, b):
        return pltpu.make_async_copy(
            ostage.at[slot], out_hbm.at[t, b], osem.at[slot]
        )

    dma_v(0, 0).start()
    dma_vn(0, 0).start()
    c_shift = c_ref[0]

    def body(b, _):
        slot = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)

        @pl.when(b + 1 < nb)
        def _():
            dma_v(nxt, b + 1).start()
            dma_vn(nxt, b + 1).start()

        dma_v(slot, b).wait()
        dma_vn(slot, b).wait()

        # V blocks are pre-transposed [D, block] (MXU-natural layout).
        # |v|^2 is added OUTSIDE the dot: folding it into the contraction
        # as an extra column quadruples the score error (the MXU
        # accumulates large-magnitude terms in reduced precision).
        scores = jax.lax.dot_general(
            q_ref[:], vbuf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QT, block]
        # One-pass (value, argmin) reduction with NO cross-lane shuffles:
        # buckets are interleaved (bucket = column % m) so each in-bucket
        # slice is a contiguous [QT, m] column group, and the reduction is
        # an explicit accumulation loop — scores are read exactly once and
        # no [QT, block] temporary (d2/enc) is materialized. Positive f32
        # bit patterns order as int32 (Mosaic has no uint reductions), so
        # the in-bucket index rides the low mantissa bits.
        vn_row = vnbuf[slot, 0]
        acc = jnp.full((qt, m), jnp.int32(2**31 - 1))
        for j in range(w):  # static unroll: Mosaic has no dynamic_slice
            sl = scores[:, j * m : (j + 1) * m]
            d2s = c_shift + (vn_row[j * m : (j + 1) * m][None, :] - 2.0 * sl)
            encs = (
                (pltpu.bitcast(d2s, jnp.int32) & jnp.int32(~_ARG_MASK)) | j
            )
            acc = jnp.minimum(acc, encs)

        # ping-pong staging: make sure this slot's previous copy-out is done
        @pl.when(b >= 2)
        def _():
            dma_out(slot, b - 2).wait()

        ostage[slot] = acc
        dma_out(slot, b).start()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)

    @pl.when(nb >= 2)
    def _():
        dma_out(jax.lax.rem(nb - 2, 2), nb - 2).wait()

    dma_out(jax.lax.rem(nb - 1, 2), nb - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block", "q_tile", "buckets", "oversample", "interpret",
    ),
)
def pallas_scan_knn(
    vectors: jax.Array,  # [N, D] float32
    queries: jax.Array,  # [Q, D] float32
    *,
    k: int,
    block: int = 16384,
    q_tile: int = 256,
    buckets: int = 128,
    oversample: int = 4,
    interpret: bool | None = None,
):
    """Exact-reranked k-NN: ``(rows [Q, k], sq_dists [Q, k])``.

    Shortlist width per query = ``buckets * N / block`` interleaved
    buckets; keep it well above ``k^2 / 2`` for ~99%+ recall.
    """
    n, d = vectors.shape
    q = queries.shape[0]
    m = buckets
    if block % m or block > m * (1 << _ARG_BITS):
        raise ValueError(
            "block must be a multiple of buckets, at most buckets*128"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, block)
    q_pad = _round_up(q, q_tile)
    nb = n_pad // block
    qt_blocks = q_pad // q_tile

    vp = jnp.pad(vectors, ((0, n_pad - n), (0, d_pad - d)))
    qp = jnp.pad(queries, ((0, q_pad - q), (0, d_pad - d)))
    vn = jnp.sum(vp * vp, axis=1)
    qn = jnp.sum(queries * queries, axis=1)
    # positivity shift: C > max(vn) + max(qn) >= max(2 q.v - vn), so the
    # packed scores' bit patterns order as int32
    c_shift = jnp.exp2(
        jnp.ceil(jnp.log2(jnp.max(vn) + jnp.max(qn) + 1.0))
    ).astype(jnp.float32).reshape(1)
    # padded rows must never win a bucket (large finite value: +inf would
    # break the int ordering of the packed encode)
    vn = jnp.where(
        jnp.arange(n_pad) < n, vn, jnp.float32(3.0e38)
    ).reshape(nb, 1, block)
    # pre-transposed blocks [nb, D, block]: MXU-natural contraction layout
    vb = jnp.swapaxes(
        vp.astype(jnp.bfloat16).reshape(nb, block, d_pad), 1, 2
    )
    qb = qp.astype(jnp.bfloat16)

    enc = pl.pallas_call(
        functools.partial(_kernel, nb=nb, block=block, m=m),
        grid=(qt_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar C
            pl.BlockSpec(memory_space=pl.ANY),  # vn stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM
            pl.BlockSpec(
                (q_tile, d_pad), lambda t: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (qt_blocks, nb, q_tile, m), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, block), jnp.bfloat16),
            pltpu.VMEM((2, 1, block), jnp.float32),
            pltpu.VMEM((2, q_tile, m), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(c_shift, vn, vb, qb)

    # unpack: [Q, nb*m] candidate (approx score, global row)
    enc = jnp.moveaxis(enc, 1, 2).reshape(q_pad, nb * m)[:q]
    cand_d = jax.lax.bitcast_convert_type(
        enc & jnp.int32(~_ARG_MASK), jnp.float32
    )
    arg = enc & jnp.int32(_ARG_MASK)
    # slot s covers rows {block*(s//m) + (s%m) + m*j : j < block/m}
    s = jnp.arange(nb * m, dtype=jnp.int32)
    base = (s // m) * block + (s % m)
    cand_r = base[None, :] + arg * m

    k_scan = min(k * oversample, nb * m)
    neg, pos = jax.lax.top_k(-cand_d, k_scan)
    short_rows = jnp.take_along_axis(cand_r, pos, axis=1)

    # f32 exact rerank of the shortlist
    safe = jnp.clip(short_rows, 0, n - 1)
    cand = vectors[safe]  # [Q, k_scan, D]
    diff = cand - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(short_rows < n, d2, jnp.inf)
    fneg, fpos = jax.lax.top_k(-d2, min(k, k_scan))
    rows = jnp.take_along_axis(short_rows, fpos, axis=1)
    out_d2 = -fneg
    rows = jnp.where(jnp.isfinite(out_d2), rows, -1)
    return rows, out_d2
