"""Batched lockstep tree search with exact rerank.

TPU re-design of the reference's two query paths:

- the recursive-CTE walk of ``dbo.Search`` (reference DDL.sql:234-295):
  from the root, descend low when ``mid >= q[dim] - radius`` and high when
  ``mid <= q[dim] + radius`` — possibly *both* — and collect reached leaves;
- the sequential DFS of ``MemoryVectorIndex.Find``
  (MemoryVectorIndex.cs:242-345).

Here thousands of queries run that walk in lockstep: a ``lax.while_loop``
DFS with an explicit per-query stack, vmapped over the query batch, so every
step is a ``[Q]``-wide gather from the SoA node table. The stack bound is
exact: a DFS that pops one node and pushes at most two children keeps at most
``depth + 1`` pending entries.

The traversal returns a candidate *superset* (axis-aligned plane tests only);
the rerank computes exact distances over the gathered leaf buckets and
filters — the same contract as the reference, where the caller's predicate
performs exact verification (MemoryVectorIndex.cs:237-241, README.md:72).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vector_database_tpu.models.bsp import BSPIndex


@dataclasses.dataclass
class SearchResult:
    """Result of a batched radius search.

    Attributes:
      rows: ``[Q, C]`` int32 — matching original input rows, -1 padding.
      sq_dists: ``[Q, C]`` float32 — squared distances, +inf at padding.
      count: ``[Q]`` int32 — number of matches per query.
      candidates: ``[Q]`` int32 — candidates examined per query (the
        generalization of the reference tests' predicate-call statistic,
        MemoryVectorIndexTests.cs:191-196).
      cand_rows: ``[Q, C]`` int32 — every candidate row the traversal
        surfaced, before the exact filter (-1 padding): the reference's
        raw ``dbo.Search`` output contract (candidate superset,
        README.md:72).
      overflow: ``[Q]`` bool — leaf buffer overflowed; results for that
        query may be incomplete (retry with larger ``max_leaves``).
    """

    rows: jax.Array
    sq_dists: jax.Array
    count: jax.Array
    candidates: jax.Array
    cand_rows: jax.Array
    overflow: jax.Array

    def match_rows(self, i: int) -> np.ndarray:
        """Matching original rows of query ``i`` as a numpy array."""
        r = np.asarray(self.rows[i])
        return r[r >= 0]


@functools.partial(
    jax.jit, static_argnames=("max_leaves", "max_stack", "axis_name")
)
def _traverse(dim, mid, low, high, queries, radius, *, max_leaves,
              max_stack, axis_name=None):
    """Masked dual-branch descent; returns reached leaf node ids per query.

    ``axis_name``: when running inside ``shard_map`` over sharded node
    tables, the while-loop carry must be marked device-varying up front
    (the body makes it varying, and shard_map's vma checker requires the
    init to match)."""

    def one(q):
        def cond(st):
            return st[1] > 0

        def body(st):
            stack, sp, leaves, nl, ov = st
            node = stack[sp - 1]
            sp = sp - 1
            d = dim[node]
            is_leaf = d == -1
            # dim == -2: id/position-partitioned node — no plane separates
            # the children, always descend both (the reference's
            # NULL-Dimension branch, DDL.sql:276-277, 291-292)
            dual = d == -2
            can = nl < max_leaves
            put = is_leaf & can
            leaves = jnp.where(
                put, leaves.at[jnp.clip(nl, 0, max_leaves - 1)].set(node),
                leaves,
            )
            nl = nl + put.astype(jnp.int32)
            ov = ov | (is_leaf & ~can)

            qd = q[jnp.maximum(d, 0)]
            m = mid[node]
            vis_lo = (~is_leaf) & (dual | (m >= qd - radius))
            vis_hi = (~is_leaf) & (dual | (m <= qd + radius))
            stack = jnp.where(vis_hi, stack.at[sp].set(high[node]), stack)
            sp = sp + vis_hi.astype(jnp.int32)
            stack = jnp.where(vis_lo, stack.at[sp].set(low[node]), stack)
            sp = sp + vis_lo.astype(jnp.int32)
            return stack, sp, leaves, nl, ov

        init = (
            jnp.zeros((max_stack,), jnp.int32),  # stack[0] = root = 0
            jnp.int32(1),
            jnp.full((max_leaves,), -1, jnp.int32),
            jnp.int32(0),
            jnp.asarray(False),
        )
        if axis_name is not None:
            init = jax.lax.pcast(init, axis_name, to="varying")
        _, _, leaves, nl, ov = jax.lax.while_loop(cond, body, init)
        return leaves, nl, ov

    return jax.vmap(one)(queries)


@functools.partial(jax.jit, static_argnames=("leaf_cap",))
def _rerank(
    leaf_start, leaf_count, vectors, orig_row, leaves, queries, radius,
    *, leaf_cap,
):
    """Expand leaf buckets to rows, compute exact distances, filter."""
    valid_leaf = leaves >= 0
    lv = jnp.where(valid_leaf, leaves, 0)
    starts = leaf_start[lv]  # [Q, L]
    cnts = jnp.where(valid_leaf, leaf_count[lv], 0)
    k = jnp.arange(leaf_cap, dtype=jnp.int32)
    rows = starts[:, :, None] + k[None, None, :]  # [Q, L, K]
    rvalid = k[None, None, :] < cnts[:, :, None]
    rows = jnp.where(rvalid, rows, 0)
    q = queries.shape[0]
    rows = rows.reshape(q, -1)
    rvalid = rvalid.reshape(q, -1)

    cand = vectors[rows]  # [Q, C, D]
    diff = cand - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    match = rvalid & (d2 <= radius * radius)
    cand_rows = jnp.where(rvalid, orig_row[rows], -1)
    out_rows = jnp.where(match, cand_rows, -1)
    d2 = jnp.where(match, d2, jnp.inf)
    return out_rows, d2, match, jnp.sum(rvalid, axis=1), cand_rows


def search(
    index: BSPIndex,
    queries,
    radius: float,
    *,
    max_leaves: Optional[int] = None,
    auto_grow: bool = True,
) -> SearchResult:
    """Find all vectors within inclusive L2 ``radius`` of each query.

    Exact (no false negatives, no false positives): the traversal provably
    never prunes a subtree containing an in-radius point, and the rerank
    filters by true distance.

    Args:
      index: a built ``BSPIndex``.
      queries: ``[Q, D]`` (or ``[D]``) query vectors.
      radius: inclusive L2 match radius.
      max_leaves: per-query leaf-buffer width; defaults to a modest guess.
      auto_grow: if a query overflows the leaf buffer, re-run everything with
        a doubled buffer until complete (host-side retry loop).
    """
    queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
    radius = jnp.float32(radius)
    num_leaf_nodes = index.num_leaves
    if max_leaves is None:
        max_leaves = min(256, num_leaf_nodes)
    max_stack = index.depth + 2
    # auto-grow safety: the rerank gathers [Q, max_leaves*leaf_cap, D]
    # floats; cap that buffer at ~2 GB so a non-selective query (high-dim
    # + wide radius: the tree prunes nothing) degrades to a reported
    # overflow instead of an OOM. Callers wanting completeness beyond the
    # cap should use the scan paths.
    budget_rows = (2 << 30) // (4 * queries.shape[0] * index.d)
    grow_cap = max(
        min(num_leaf_nodes, budget_rows // max(index.leaf_cap, 1)), 1
    )
    max_leaves = min(max_leaves, grow_cap)

    while True:
        leaves, _, ov = _traverse(
            index.dim, index.mid, index.low, index.high, queries, radius,
            max_leaves=max_leaves, max_stack=max_stack,
        )
        if auto_grow and bool(jnp.any(ov)) and max_leaves < grow_cap:
            max_leaves = min(max_leaves * 2, grow_cap)
            continue
        break

    rows, d2, match, ncand, cand_rows = _rerank(
        index.leaf_start, index.leaf_count, index.vectors, index.orig_row,
        leaves, queries, radius, leaf_cap=index.leaf_cap,
    )
    return SearchResult(
        rows=rows,
        sq_dists=d2,
        count=jnp.sum(match, axis=1).astype(jnp.int32),
        candidates=ncand.astype(jnp.int32),
        cand_rows=cand_rows,
        overflow=ov,
    )


def calibrate_radius(
    vectors,
    sample_queries,
    k: int,
    quantile: float = 0.95,
    *,
    max_sample: int = 65536,
) -> float:
    """Pick an ε for radius-bounded k-NN: the ``quantile`` of the k-th
    neighbor distance over a query sample (computed exactly on the MXU).
    Searching with this radius yields ≥ ~quantile expected recall@k.

    The database side is subsampled to ``max_sample`` rows (strided, so the
    scan stays cheap even at 10M rows); sampling can only *overestimate*
    the k-th neighbor distance, which trades extra candidates for recall —
    never the other way."""
    from vector_database_tpu.ops.exact import exact_knn

    n = vectors.shape[0]
    if n > max_sample:
        stride = -(-n // max_sample)
        vectors = vectors[::stride]
    _, d2 = exact_knn(vectors, sample_queries, k=min(k, vectors.shape[0]))
    kth = jnp.sqrt(d2[:, -1])
    return float(jnp.quantile(kth, quantile))


def knn(
    index: BSPIndex,
    queries,
    k: int,
    radius: Optional[float] = None,
    *,
    max_leaves: Optional[int] = None,
):
    """k nearest neighbors among vectors within ``radius`` of each query.

    Returns ``(rows [Q, k], sq_dists [Q, k])`` with -1 / +inf padding when a
    query has fewer than ``k`` in-radius neighbors. ``radius`` bounds the
    candidate generation (the ANN knob: larger radius = higher recall,
    more candidates); ``radius=None`` auto-calibrates it from the k-th
    neighbor distances of a query sample (95th percentile + 10% margin).
    """
    if radius is None:
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        radius = 1.1 * calibrate_radius(
            index.vectors, queries[: min(64, queries.shape[0])], k, 0.95
        )
    res = search(index, queries, radius, max_leaves=max_leaves)
    if bool(jnp.any(res.overflow)):
        import warnings

        warnings.warn(
            "knn: the leaf buffer overflowed at its growth cap for "
            f"{int(jnp.sum(res.overflow))} queries; their candidate sets "
            "are truncated (results may miss neighbors). Use scan_knn / "
            "pallas_scan_knn for non-selective high-dimensional queries.",
            RuntimeWarning,
            stacklevel=2,
        )
    neg, pos = jax.lax.top_k(-res.sq_dists, k)
    rows = jnp.take_along_axis(res.rows, pos, axis=1)
    d2 = -neg
    rows = jnp.where(jnp.isfinite(d2), rows, -1)
    return rows, d2
