"""Query-side data parallelism: shard the query batch over the mesh.

The node table and vectors are replicated; each device walks the tree for
its query shard (the lockstep DFS of ``search.py`` partitions trivially
along Q). This is the DP row of SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vector_database_tpu.models.bsp import BSPIndex
from vector_database_tpu.search import SearchResult, search, knn


def _pad_and_place(queries, mesh: Mesh, axis: str):
    queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
    q = queries.shape[0]
    shards = mesh.shape[axis]
    q_pad = ((q + shards - 1) // shards) * shards
    if q_pad != q:
        # pad with a REPEAT of the first query, not zeros: the origin is
        # the centroid of mean-centered data — a worst-case query whose
        # overflowing leaf buffer would force auto-grow (recompile +
        # wider rerank) and inflate overflow warnings for the whole
        # batch. A repeated real query adds no new behavior.
        queries = jnp.concatenate(
            [
                queries,
                jnp.broadcast_to(
                    queries[:1], (q_pad - q, queries.shape[1])
                ),
            ]
        )
    queries = jax.device_put(
        queries, NamedSharding(mesh, P(axis, None))
    )
    return queries, q


def search_sharded(
    index: BSPIndex,
    queries,
    radius: float,
    mesh: Mesh,
    *,
    axis: str = "data",
    max_leaves: Optional[int] = None,
) -> SearchResult:
    """``search`` with the query batch sharded over ``mesh[axis]``."""
    placed, q = _pad_and_place(queries, mesh, axis)
    res = search(index, placed, radius, max_leaves=max_leaves)
    return SearchResult(
        rows=res.rows[:q],
        sq_dists=res.sq_dists[:q],
        count=res.count[:q],
        candidates=res.candidates[:q],
        cand_rows=res.cand_rows[:q],
        overflow=res.overflow[:q],
    )


def knn_sharded(
    index: BSPIndex,
    queries,
    k: int,
    radius: float,
    mesh: Mesh,
    *,
    axis: str = "data",
    max_leaves: Optional[int] = None,
):
    """``knn`` with the query batch sharded over ``mesh[axis]``."""
    placed, q = _pad_and_place(queries, mesh, axis)
    rows, d2 = knn(index, placed, k, radius, max_leaves=max_leaves)
    return rows[:q], d2[:q]
