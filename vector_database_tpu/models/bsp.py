"""Flat structure-of-arrays BSP index.

The node table unifies the reference's persisted node shapes —
``RangeValue { Dimension, Mid, Id }`` (reference VectorIndex/RangeValue.cs:6-22)
and the ``dbo.TextIndex`` row
``(RangeID, Dimension, Mid, LowRangeID, HighRangeID, TextID)``
(reference DDL.sql:209-227) — into dense SoA device arrays. The sparse heap
numbering ``2r+1 / 2r+2`` of the reference (IndexBuilder.cs:99-105) overflows
int64 past ~62 levels; here node ids are dense (level-major order of
appearance) and heap ids are reconstructed only on export.

Vectors are stored leaf-major (sorted by leaf node), so each leaf bucket is a
contiguous ``[start, start+count)`` slice — the device-friendly rebirth of the
reference's bump-allocated mmap regions (FileRangeStore.cs:127-165).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BSPIndex:
    """A built variance-split BSP tree over ``n`` vectors of dim ``d``.

    Node table (all ``[num_nodes]``):
      dim:  split dimension; -1 for leaves.
      mid:  split plane (the segment mean on ``dim``); 0 for leaves.
      low / high: dense child node ids; -1 for leaves.
      leaf_start / leaf_count: contiguous slice of the leaf-major arrays;
        (0, 0) for internal nodes.

    Point data (leaf-major order):
      vectors: ``[n, d]`` float32.
      orig_row: ``[n]`` int32 — original input row of each sorted row, for
        mapping results back to caller ids.
    """

    dim: jax.Array
    mid: jax.Array
    low: jax.Array
    high: jax.Array
    leaf_start: jax.Array
    leaf_count: jax.Array
    vectors: jax.Array
    orig_row: jax.Array
    depth: int = dataclasses.field(metadata=dict(static=True))
    leaf_cap: int = dataclasses.field(metadata=dict(static=True))
    num_leaves: int = dataclasses.field(metadata=dict(static=True))
    # plane-tie routing convention of the BUILD: False = builder trees
    # (q[dim] == mid routed by id at build time — not reproducible by a
    # query); True = trie exports (v >= center always routes high, so a
    # point lookup CAN reproduce it — ``locate`` descends accordingly)
    ties_high: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def num_nodes(self) -> int:
        return self.dim.shape[0]

    @property
    def n(self) -> int:
        return self.vectors.shape[0]

    @property
    def d(self) -> int:
        return self.vectors.shape[1]

    # --- persistence: the node table *is* the checkpoint format, like the
    # reference's CSV export (Program.cs:145-150) / dbo.TextIndex durability.
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            dim=np.asarray(self.dim),
            mid=np.asarray(self.mid),
            low=np.asarray(self.low),
            high=np.asarray(self.high),
            leaf_start=np.asarray(self.leaf_start),
            leaf_count=np.asarray(self.leaf_count),
            vectors=np.asarray(self.vectors),
            orig_row=np.asarray(self.orig_row),
            meta=np.array(
                [self.depth, self.leaf_cap, self.num_leaves,
                 int(self.ties_high)],
                dtype=np.int64,
            ),
        )

    @classmethod
    def load(cls, path: str) -> "BSPIndex":
        z = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        meta = [int(v) for v in z["meta"]]
        depth, leaf_cap, num_leaves = meta[:3]
        ties_high = bool(meta[3]) if len(meta) > 3 else False
        return cls(
            dim=jnp.asarray(z["dim"]),
            mid=jnp.asarray(z["mid"]),
            low=jnp.asarray(z["low"]),
            high=jnp.asarray(z["high"]),
            leaf_start=jnp.asarray(z["leaf_start"]),
            leaf_count=jnp.asarray(z["leaf_count"]),
            vectors=jnp.asarray(z["vectors"]),
            orig_row=jnp.asarray(z["orig_row"]),
            depth=depth,
            leaf_cap=leaf_cap,
            num_leaves=num_leaves,
            ties_high=ties_high,
        )

    def heap_rows(self):
        """Reconstruct reference-style heap range ids for export parity.

        Yields ``(range_id, dimension, mid, id)`` rows in the shape of the
        reference CSV export ``RangeID,Dimension,Mid,ID``
        (Program.cs:80,145-150): internal nodes carry (dimension, mid),
        leaves carry ``dimension = -1`` and the vector id. Only defined for
        ``leaf_cap == 1`` trees (singleton leaves, the reference's shape).
        """
        dim = np.asarray(self.dim)
        mid = np.asarray(self.mid)
        low = np.asarray(self.low)
        high = np.asarray(self.high)
        start = np.asarray(self.leaf_start)
        orig = np.asarray(self.orig_row)
        stack = [(0, 0)]  # (dense node, heap id)
        while stack:
            node, heap = stack.pop()
            if dim[node] == -1:
                yield heap, -1, 0.0, int(orig[start[node]])
            else:
                # dim -2 = id-partitioned node (the reference exports NULL
                # Dimension/Mid for these, DDL.sql:193-194)
                yield heap, int(dim[node]), float(mid[node]), -1
                stack.append((int(low[node]), 2 * heap + 1))
                stack.append((int(high[node]), 2 * heap + 2))
