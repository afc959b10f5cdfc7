"""Whole-build-in-one-kernel: the production build path.

The host-driven loop in ``builder.py`` pays one device round-trip and (for
the first build at a given size) one XLA compile per tree level — tolerable
for debugging, fatal for the <30 s / 10M target (SURVEY.md §6). This module
runs the *entire* level loop inside a single ``jax.lax.while_loop`` under one
jit:

- segment capacity is fixed at ``s_max`` (a static bound on live segments
  per level: every internal range holds > ``leaf_size`` points, so a level
  has at most ``2 * n // (leaf_size + 1)`` children) — constant shapes,
  one compile, no per-level host sync;
- the node table is emitted with masked scatters into preallocated
  ``[m_max]`` arrays (a binary tree over at most n leaves has < 2n nodes);
- termination is the dynamic ``while_loop`` condition ``live_segments > 0``
  — the level-synchronous analogue of the reference's
  ``while (@next != 0)`` (DDL.sql:114-187).

The algorithm is identical to ``ops/level.py`` (it calls the same
``level_math``); tests assert tree-for-tree equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vector_database_tpu.ops.level import level_math


@functools.partial(
    jax.jit,
    static_argnames=("s_max", "m_max", "leaf_size", "max_levels",
                     "axis_name"),
)
def fused_build(
    vectors: jax.Array,  # [N, D] float32
    seg0: jax.Array,  # [N] int32: 0 for live rows, -1 for padding
    row_ids: jax.Array,  # [N] int32
    *,
    s_max: int,
    m_max: int,
    leaf_size: int,
    max_levels: int,
    axis_name: str | None = None,
):
    """Run the full level-synchronous build on device.

    Returns ``(dim, mid, low, high, leaf_of_point, total_nodes, depth)``
    with node arrays sized ``[m_max]`` (caller slices to ``total_nodes``).
    """
    n = vectors.shape[0]

    init = (
        seg0,
        jnp.full((n,), -1, jnp.int32),  # leaf_of_point
        jnp.full((m_max,), -1, jnp.int32),  # node dim
        jnp.zeros((m_max,), jnp.float32),  # node mid
        jnp.full((m_max,), -1, jnp.int32),  # node low
        jnp.full((m_max,), -1, jnp.int32),  # node high
        jnp.int32(0),  # node_base
        jnp.int32(1),  # live segments this level
        jnp.asarray(True),  # use_max
        jnp.int32(0),  # level
    )

    def cond(st):
        return (st[7] > 0) & (st[9] < max_levels)

    def body(st):
        seg, leaf, nd, nm, nl, nh, node_base, s_live, use_max, level = st
        out = level_math(
            vectors, row_ids, seg, leaf, use_max, node_base,
            num_segments=s_max, leaf_size=leaf_size, axis_name=axis_name,
        )
        cnt = out["cnt"]
        sidx = jnp.arange(s_max, dtype=jnp.int32)
        live = sidx < s_live
        # On the last permitted level every live segment is retired as an
        # (oversized) leaf — same cap semantics as the host-loop builder.
        last = level >= max_levels - 1
        is_int = live & (cnt > leaf_size) & ~last
        ii = is_int.astype(jnp.int32)
        rank = jnp.cumsum(ii) - ii
        next_base = node_base + s_live

        tgt = jnp.where(live, node_base + sidx, m_max)  # m_max -> dropped
        nd = nd.at[tgt].set(
            jnp.where(is_int, out["split_dim"], -1), mode="drop"
        )
        nm = nm.at[tgt].set(jnp.where(is_int, out["mid"], 0.0), mode="drop")
        nl = nl.at[tgt].set(
            jnp.where(is_int, next_base + 2 * rank, -1), mode="drop"
        )
        nh = nh.at[tgt].set(
            jnp.where(is_int, next_base + 2 * rank + 1, -1), mode="drop"
        )

        num_internal = jnp.sum(ii)
        new_seg = jnp.where(last, -1, out["new_seg"])
        new_leaf = jnp.where(
            last,
            jnp.where(seg >= 0, node_base + seg, leaf),
            out["new_leaf"],
        )
        return (
            new_seg, new_leaf, nd, nm, nl, nh,
            next_base, 2 * num_internal, ~use_max, level + 1,
        )

    seg, leaf, nd, nm, nl, nh, node_base, s_live, _, level = (
        jax.lax.while_loop(cond, body, init)
    )

    # Depth-cap exit: any still-live segment is retired as an (oversized)
    # leaf; the preallocated node defaults (-1 dim, -1 children) already
    # describe a leaf.
    leaf = jnp.where(seg >= 0, node_base + seg, leaf)
    total_nodes = node_base + s_live
    return nd, nm, nl, nh, leaf, total_nodes, level


def segment_capacity(n: int, leaf_size: int) -> int:
    """Static bound on live segments in any level: children of internal
    ranges only, and an internal range holds at least ``leaf_size + 1``
    points."""
    return max(1, 2 * (n // (leaf_size + 1)))
