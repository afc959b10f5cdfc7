"""Multi-chip parallelism over a ``jax.sharding.Mesh``.

The reference is strictly single-process (SURVEY.md §2.2, §5: no NCCL/MPI,
no threads — the earlier parallel builder was abandoned, README.md:91-98).
This package is the TPU-native scaling story it never had:

- **build**: rows sharded over the ``data`` mesh axis; per-level segment
  statistics merged with ``psum``/``pmin``/``pmax`` inside ``shard_map``
  (``ops/level.py``) — one *global* tree, identical on every shard, with
  only [S, D]-sized collectives per level riding ICI.
- **query**: query-batch data parallelism (``search_sharded``), and
  per-shard-forest search with an all-gather top-k merge
  (``forest.py``) for database sharding.
"""

from vector_database_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_rows,
)
from vector_database_tpu.parallel.query import search_sharded, knn_sharded

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_rows",
    "search_sharded",
    "knn_sharded",
]
