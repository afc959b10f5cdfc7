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

    @classmethod
    def from_heap_rows(cls, rows, vectors, *, ids=None,
                       ties_high: bool = False):
        """Rebuild an index from reference-style heap export rows — the
        migration path for indexes built by the reference itself.

        ``rows`` is an iterable of ``(range_id, dimension, mid, id)`` in
        the reference's persisted shapes: the CSV export
        ``RangeID,Dimension,Mid,ID`` (Program.cs:145-150) or
        ``dbo.TextIndex`` rows (DDL.sql:209-227). Accepted per row:

        - ``dimension >= 0``: internal split node (``mid`` is the plane;
          the reference's internal ``id`` — its mean-id tie-break
          metadata, Stats.cs:26 — is build-time-only and ignored);
        - ``dimension == -1``: singleton leaf, ``id`` is the vector id
          (IndexBuilder.cs:81-88);
        - ``dimension == -2``: this package's dual-descent export of
          id-partitioned nodes;
        - ``dimension`` None/empty/"NULL" (the SQL NULL-Dimension form,
          DDL.sql:190-199): a leaf when ``id`` is set, an id-partitioned
          dual node otherwise.

        ``vectors`` is the ``[n, d]`` float array the exported ids index
        (the reference's vector ids). By default leaf ids are taken as
        row positions into ``vectors`` (the reference's HDF5 path emits
        ids 0..n-1 in file order, Program.cs:221-260); pass ``ids`` (the
        ``int[n]`` array ``load_vectors_csv`` returns) when the export's
        vector ids are not positional — leaf ids are then remapped
        through it, and the served row numbers (``orig_row`` / ``knn``
        results) refer to positions in ``vectors``. A dump spanning
        several documents (``dbo.TextIndex`` is keyed (RangeID, DocID),
        so RangeIDs repeat across documents) must be imported one
        document at a time — duplicate range ids raise.

        Children are located by heap
        numbering (``2r+1``/``2r+2``, IndexBuilder.cs:99-105) and the
        sparse heap ids are compacted to this package's dense layout;
        rows come out leaf-major, so the result serves through every
        query path (``search`` / ``knn`` / the scan kernels) exactly
        like a natively built tree. Round-trip invariant (tested):
        ``from_heap_rows(idx.heap_rows(), ...)`` reproduces
        ``idx.heap_rows()`` row for row.
        """

        def _opt(x, none_val):
            if x is None:
                return none_val
            if isinstance(x, str):
                s = x.strip()
                if s == "" or s.upper() == "NULL":
                    return none_val
                x = s
            return x

        table = {}
        for r in rows:
            heap = int(r[0])
            if heap in table:
                raise ValueError(
                    f"duplicate range id {heap} in export — a "
                    "dbo.TextIndex dump spanning documents must be "
                    "imported one DocID at a time"
                )
            dim_v = _opt(r[1], None)
            mid_v = float(_opt(r[2], 0.0))
            vid_v = int(_opt(r[3], -1))
            table[heap] = (None if dim_v is None else int(dim_v),
                           mid_v, vid_v)
        if 0 not in table:
            raise ValueError("no root row (RangeID 0) in export")
        vec_np = np.asarray(vectors, dtype=np.float32)
        n, d = vec_np.shape
        pos_of = None
        if ids is not None:
            ids_np = np.asarray(ids, dtype=np.int64)
            if ids_np.shape != (n,):
                raise ValueError(
                    f"ids has shape {ids_np.shape}, expected ({n},)"
                )
            if len(np.unique(ids_np)) != n:
                raise ValueError("duplicate vector id in ids")
            pos_of = {int(v): i for i, v in enumerate(ids_np)}

        # preorder walk: assign dense ids in visit order (children are
        # resolved by heap arithmetic, so one pass suffices with the
        # child ids computed from a running counter)
        dims, mids, lows, highs = [], [], [], []
        lstart, lcount, orig = [], [], []
        depth_max = 0
        stack = [(0, 0)]
        dense_of = {}
        while stack:
            heap, hdepth = stack.pop()
            dim_v, mid_v, vid_v = table[heap]
            node = len(dims)
            dense_of[heap] = node
            depth_max = max(depth_max, hdepth)
            lo_h, hi_h = 2 * heap + 1, 2 * heap + 2
            has_children = lo_h in table or hi_h in table
            if dim_v is None:
                # SQL NULL-dimension row: leaf iff it carries a vector id
                dim_v = -2 if (vid_v < 0 or has_children) else -1
            if dim_v == -1:
                if has_children:
                    raise ValueError(f"leaf range {heap} has children")
                if pos_of is not None:
                    if vid_v not in pos_of:
                        raise ValueError(
                            f"leaf range {heap}: vector id {vid_v} not "
                            "present in ids"
                        )
                    vid_v = pos_of[vid_v]
                if not (0 <= vid_v < n):
                    raise ValueError(
                        f"leaf range {heap}: vector id {vid_v} outside "
                        f"[0, {n})"
                    )
                dims.append(-1)
                mids.append(0.0)
                lows.append(-1)
                highs.append(-1)
                lstart.append(len(orig))
                lcount.append(1)
                orig.append(vid_v)
            else:
                if lo_h not in table or hi_h not in table:
                    raise ValueError(
                        f"internal range {heap} is missing a child "
                        f"({lo_h}/{hi_h})"
                    )
                if dim_v != -2 and not (0 <= dim_v < d):
                    # a wrong export/vectors pairing would otherwise
                    # serve silently wrong results (the query gather
                    # clamps out-of-range dims)
                    raise ValueError(
                        f"internal range {heap}: split dimension "
                        f"{dim_v} outside [0, {d})"
                    )
                dims.append(int(dim_v))
                mids.append(mid_v)
                lows.append(-1)  # patched when the child is visited
                highs.append(-1)
                lstart.append(0)
                lcount.append(0)
                # push low last so it is visited first (preorder)
                stack.append((hi_h, hdepth + 1))
                stack.append((lo_h, hdepth + 1))
            if heap:  # patch the parent's child pointer
                parent = dense_of[(heap - 1) // 2]
                if heap % 2 == 1:
                    lows[parent] = node
                else:
                    highs[parent] = node
        if len(orig) != n:
            raise ValueError(
                f"export has {len(orig)} leaves but vectors has {n} rows"
            )
        orig_np = np.asarray(orig, dtype=np.int32)
        if len(np.unique(orig_np)) != n:
            raise ValueError("duplicate vector id across leaves")
        return cls(
            dim=jnp.asarray(np.asarray(dims, np.int32)),
            mid=jnp.asarray(np.asarray(mids, np.float32)),
            low=jnp.asarray(np.asarray(lows, np.int32)),
            high=jnp.asarray(np.asarray(highs, np.int32)),
            leaf_start=jnp.asarray(np.asarray(lstart, np.int32)),
            leaf_count=jnp.asarray(np.asarray(lcount, np.int32)),
            vectors=jnp.asarray(vec_np[orig_np]),
            orig_row=jnp.asarray(orig_np),
            depth=depth_max + 1,
            leaf_cap=1,
            num_leaves=n,
            ties_high=ties_high,
        )

    @classmethod
    def from_reference_csv(cls, path, vectors, **kw):
        """``from_heap_rows`` over a reference-format CSV file
        (``RangeID,Dimension,Mid,ID`` with or without the header line —
        the file Program.cs:145-150 writes and ``benchmarks/main_test.py``
        mirrors). Pass ``ids=`` (from ``load_vectors_csv``) when the
        dataset export's vector ids are not positional."""

        def _rows():
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line or line[0].isalpha() or line[0] == '"':
                        continue  # header / blank
                    parts = line.split(",")
                    if len(parts) != 4:
                        raise ValueError(f"bad CSV row: {line!r}")
                    yield parts
        return cls.from_heap_rows(_rows(), vectors, **kw)
