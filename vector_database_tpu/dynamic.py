"""Incremental (mutable) index on top of the immutable BSP tree.

The reference offers two mutation models: the incremental in-memory trie
(``MemoryVectorIndex.Add/Remove``) and document-scoped full reindexing
(``dbo.IndexDocument``'s delete + insert, DDL.sql:397-418). For bulk
TPU serving the right design is the classic main + delta:

- the **main** segment is an immutable ``BSPIndex`` with a tombstone mask
  (removals never restructure the tree — they hide rows);
- **adds** go to a delta buffer searched by exact MXU scan (small, so the
  scan is cheap and exact);
- when the delta or the tombstones exceed a threshold fraction,
  ``compact()`` rebuilds the tree over the live rows with the fused
  single-compile builder — the TPU build is fast enough (SURVEY.md §6) that
  rebuild-on-threshold replaces the reference trie's per-record surgery.

Search semantics match the rest of the framework: exact, radius-bounded,
with stable external ids assigned at insert."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vector_database_tpu.builder import build_index_fused
from vector_database_tpu.ops.exact import exact_sq_dists
from vector_database_tpu.ops.scan_knn import scan_knn
from vector_database_tpu.search import search as bsp_search


def _exact_d2_blocked(queries, vectors) -> np.ndarray:
    """Squared distances ``[Q, N]`` numerically identical to the tree's
    rerank (direct diff-square, so overflow-fallback answers agree with
    non-overflow ones on boundary rows) with BOUNDED device memory: the
    ``[Q, block, D]`` diff transient is capped at ~256 MB, where a whole
    -matrix ``exact_sq_dists`` call materializes ``[Q, N, D]`` — ~23 GB
    for 60 overflowed queries on a 1M x 96 main segment."""
    q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
    nq, d = q.shape
    n = vectors.shape[0]
    block = max(1024, (1 << 28) // max(1, nq * d * 4))
    if n <= block:
        return np.asarray(exact_sq_dists(q, vectors))
    outs = []
    for s in range(0, n, block):
        outs.append(np.asarray(exact_sq_dists(
            q, jax.lax.slice_in_dim(vectors, s, min(s + block, n))
        )))
    return np.concatenate(outs, axis=1)


class DynamicIndex:
    """Mutable exact ε-ball / k-NN index with stable integer ids."""

    def __init__(
        self,
        vectors=None,
        *,
        leaf_size: int = 8,
        rebuild_fraction: float = 0.25,
    ):
        self._leaf_size = leaf_size
        self._rebuild_fraction = rebuild_fraction
        self._next_id = 0
        self._index = None  # main BSPIndex
        self._main_ids = np.zeros((0,), np.int64)  # external id per main row
        self._main_alive = np.zeros((0,), bool)
        self._delta_vecs: list[np.ndarray] = []
        self._delta_ids: list[int] = []
        self._dims: Optional[int] = None
        self._serve = None  # (device live matrix, external ids) cache
        self._packed = None  # (serve-view matrix identity, PackedDB)
        if vectors is not None:
            self.add(vectors)
            if self._delta_vecs:  # add's threshold may have compacted
                self.compact()

    def _live_main(self):
        """Live main-segment rows as ``(vectors, external_ids)`` numpy
        arrays (empty when no main index / no survivors). The single
        place that maps leaf-major sorted positions back through
        ``orig_row`` to the input rows that ids/tombstones are keyed by —
        shared by ``_serve_view`` and ``compact`` so the mapping can
        never desynchronize between serving and compaction."""
        if self._index is None or not self._main_alive.any():
            return (
                np.zeros((0, self._dims or 0), np.float32),
                np.zeros((0,), np.int64),
            )
        orig = np.asarray(self._index.orig_row)
        if self._main_alive.all():
            return np.asarray(self._index.vectors), self._main_ids[orig]
        keep = self._main_alive[orig]
        return (
            np.asarray(self._index.vectors)[keep],
            self._main_ids[orig[keep]],
        )

    def _live_parts(self):
        """Live rows of main + delta as host ``(parts_v, parts_i)`` lists
        — shared by ``_serve_view``'s slow path and ``compact`` so the
        assembly (including the empty-main/empty-delta cases) can never
        desynchronize between serving and compaction."""
        parts_v, parts_i = [], []
        mv, mi = self._live_main()
        if mv.shape[0]:
            parts_v.append(mv)
            parts_i.append(mi)
        if self._delta_vecs:
            parts_v.append(np.stack(self._delta_vecs))
            parts_i.append(np.asarray(self._delta_ids, np.int64))
        return parts_v, parts_i

    def _serve_view(self):
        """Device view for batched serving: the live rows of main + delta
        as ONE device matrix with aligned external ids. Built lazily and
        invalidated by every mutation — serving batches then cost a
        single device dispatch instead of per-row host loops."""
        if self._serve is None:
            if self._index is not None and self._main_alive.all():
                # device fast path: the main matrix is reused in place.
                # The general path round-trips it device->host->device —
                # minutes per single-row mutation at 10M x 96 through a
                # ~30 MB/s link; only the [N] orig_row transfers here.
                mi = self._main_ids[np.asarray(self._index.orig_row)]
                if self._delta_vecs:
                    self._serve = (
                        jnp.concatenate([
                            self._index.vectors,
                            jnp.asarray(
                                np.stack(self._delta_vecs), jnp.float32
                            ),
                        ]),
                        np.concatenate([
                            mi, np.asarray(self._delta_ids, np.int64)
                        ]),
                    )
                else:
                    self._serve = (self._index.vectors, mi)
                return self._serve
            parts_v, parts_i = self._live_parts()
            if not parts_v:
                self._serve = (None, np.zeros((0,), np.int64))
            else:
                self._serve = (
                    jnp.asarray(np.concatenate(parts_v)),
                    np.concatenate(parts_i),
                )
        return self._serve

    def _invalidate_serve(self) -> None:
        """Drop the serve view AND the pack on every mutation: a stale
        pack keeps the old serve matrix + bf16 blocks (~6+ GB at
        10M x 96) HBM-resident, and the next packed call would build the
        new pack while the old one is still referenced — double
        residency on a 16 GB chip (advisor finding, round 3)."""
        self._serve = None
        self._packed = None

    # --- size -------------------------------------------------------------
    def __len__(self) -> int:
        return int(self._main_alive.sum()) + len(self._delta_ids)

    @property
    def dims(self) -> Optional[int]:
        return self._dims

    # --- mutation -----------------------------------------------------------
    def add(self, vectors) -> np.ndarray:
        """Insert rows; returns their assigned external ids."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim <= 1 and vectors.size == 0:
            # atleast_2d would turn [] into shape (1, 0) — a phantom
            # zero-dim row that locks _dims to 0 and bricks the index
            return np.zeros((0,), np.int64)
        vectors = np.atleast_2d(vectors)
        if self._dims is None:
            self._dims = vectors.shape[1]
        elif vectors.shape[1] != self._dims:
            raise ValueError("invalid vector size")
        ids = np.arange(
            self._next_id, self._next_id + vectors.shape[0], dtype=np.int64
        )
        self._next_id += vectors.shape[0]
        self._delta_vecs.extend(vectors)
        self._delta_ids.extend(ids.tolist())
        self._invalidate_serve()
        self._maybe_compact()
        return ids

    def remove(self, vector, radius: float) -> int:
        """Remove every row within ``radius`` of ``vector`` (the reference's
        ε-ball removal contract, MemoryVectorIndex.cs:358-361). Returns the
        number removed."""
        removed = 0
        if self._index is not None:
            res = bsp_search(self._index, vector, radius)
            if bool(np.asarray(res.overflow)[0]):
                # the tree walk's candidate buffer capped out: a silent
                # truncation here would leave in-radius rows alive
                # forever — fall back to one exact scan over the main
                # segment (removal is rare; exactness is the contract)
                d2 = _exact_d2_blocked(vector, self._index.vectors)[0]
                orig = np.asarray(self._index.orig_row)
                rows = orig[d2 <= np.float32(radius) ** 2]
            else:
                rows = np.asarray(res.rows[0])
                rows = rows[rows >= 0]
            hit = rows[self._main_alive[rows]]
            self._main_alive[hit] = False
            removed += hit.size
        if self._delta_vecs:
            mat = np.stack(self._delta_vecs)
            d2 = np.sum((mat - np.asarray(vector, np.float32)) ** 2, axis=1)
            # f32 radius square, like the device compare on the main
            # segment — a boundary row must not flip segments' verdicts
            keep = d2 > np.float32(radius) ** 2
            removed += int((~keep).sum())
            self._delta_vecs = [
                v for v, k in zip(self._delta_vecs, keep) if k
            ]
            self._delta_ids = [
                i for i, k in zip(self._delta_ids, keep) if k
            ]
        self._invalidate_serve()
        self._maybe_compact()
        return removed

    def remove_ids(self, ids) -> int:
        """Remove rows by external id."""
        ids = set(int(i) for i in np.atleast_1d(ids))
        hit = np.isin(self._main_ids, list(ids)) & self._main_alive
        self._main_alive[hit] = False
        removed = int(hit.sum())
        keep = [i not in ids for i in self._delta_ids]
        removed += keep.count(False)
        self._delta_vecs = [v for v, k in zip(self._delta_vecs, keep) if k]
        self._delta_ids = [i for i, k in zip(self._delta_ids, keep) if k]
        self._invalidate_serve()
        self._maybe_compact()
        return removed

    # --- queries -------------------------------------------------------------
    def search(self, queries, radius: float):
        """Exact ε-ball search; returns per-query ``(ids, sq_dists)``."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        nq = queries.shape[0]
        out = [([], []) for _ in range(nq)]
        if self._index is not None:
            res = bsp_search(self._index, queries, radius)
            ovf = np.asarray(res.overflow)
            # overflowed queries (candidate buffer at its growth cap)
            # would silently lose matches — re-answer those few with one
            # exact scan over the main segment, keeping the contract
            exact_d2 = None
            if ovf.any():
                sub = np.nonzero(ovf)[0]
                exact_d2 = _exact_d2_blocked(
                    queries[sub], self._index.vectors
                )
                orig = np.asarray(self._index.orig_row)
                sub_pos = {int(q): j for j, q in enumerate(sub)}
            for qi in range(nq):
                if exact_d2 is not None and qi in sub_pos:
                    d2 = exact_d2[sub_pos[qi]]
                    m = d2 <= np.float32(radius) ** 2
                    rows, d2 = orig[m], d2[m]
                else:
                    rows = np.asarray(res.rows[qi])
                    d2 = np.asarray(res.sq_dists[qi])
                    keep = rows >= 0
                    rows, d2 = rows[keep], d2[keep]
                alive = self._main_alive[rows]
                out[qi][0].extend(self._main_ids[rows[alive]].tolist())
                out[qi][1].extend(d2[alive].tolist())
        if self._delta_vecs:
            mat = np.stack(self._delta_vecs)
            d2 = np.asarray(exact_sq_dists(jnp.asarray(queries),
                                           jnp.asarray(mat)))
            for qi in range(nq):
                hit = d2[qi] <= np.float32(radius) ** 2
                out[qi][0].extend(
                    np.asarray(self._delta_ids)[hit].tolist()
                )
                out[qi][1].extend(d2[qi][hit].tolist())
        return [
            (np.asarray(i, np.int64), np.asarray(d, np.float32))
            for i, d in out
        ]

    def knn(self, queries, k: int, radius: Optional[float] = None,
            *, exact: Optional[bool] = None, allowed_ids=None,
            packed: bool = False, probes: Optional[int] = None,
            q_tile: int = 256, oversample: Optional[int] = None):
        """k nearest neighbors (within ``radius`` if given);
        ``(ids [Q,k], sq_dists [Q,k])`` with -1 / +inf padding.

        Device path: ONE streaming MXU scan over the cached live-row
        matrix (main + delta merged, tombstones excluded) — no per-query
        host loops. ``exact=True`` (default) keeps the class's exactness
        contract (f32 scores, exact per-block top-k); ``exact=False``
        runs the bf16 bucketed scan (measured recall@10: 0.992 digits
        fixture, 0.986-0.99 clustered 1M-10M x 96 — recall_qps.py; exact
        distances on whatever it returns) for maximum throughput.

        ``allowed_ids``: optional array of this index's ids — results
        are restricted to them (filtered k-NN; the mask rides the scan,
        never a post-filter). With ``exact=True`` (default) the
        restriction is exact at any selectivity; ``exact=False`` keeps
        the bucketed scan's collision loss model over the allowed rows
        — prefer the default for sparse allowlists.

        ``packed=True``: serve through the Pallas serving kernel
        (``pack_database`` + ``pallas_scan_knn_packed``) — the live view
        is packed ONCE per mutation epoch (cached alongside the serve
        view, invalidated by any mutation) and each batch streams the
        transposed bf16 blocks at kernel rate (~4x the exact scan's QPS
        at 1M+ rows; same accuracy model as ``exact=False``: bf16 bucket
        selection + exact f32 rerank of the shortlist). ``probes=``
        additionally enables the pruned scan (only that many database
        blocks stream per query tile — the IVF-style high-QPS operating
        points; see ``pallas_scan_knn_packed``). The pack costs roughly
        one 1024-query batch, so ``packed=True`` pays for serving-heavy,
        mutation-light epochs; interleaved add/search workloads should
        keep the default exact scan. Incompatible with ``allowed_ids``
        (the packed kernel has no filtered path — raises ValueError) and
        with an explicit ``exact=True`` (the pack serves the bucketed
        accuracy model; raises rather than silently downgrade)."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        nq = queries.shape[0]
        mat, ids_map = self._serve_view()
        if mat is None:
            return (
                np.full((nq, k), -1, np.int64),
                np.full((nq, k), np.inf, np.float32),
            )
        if packed:
            if allowed_ids is not None:
                raise ValueError(
                    "packed=True has no filtered path; use the default "
                    "exact scan for allowed_ids= serving"
                )
            if exact:
                raise ValueError(
                    "packed=True serves the bf16 bucketed-scan accuracy "
                    "model and cannot honor exact=True; drop one of them"
                )
            from vector_database_tpu.ops.pallas_knn import (
                pack_database,
                pallas_scan_knn_packed,
            )

            if self._packed is None or self._packed[0] is not mat:
                # keyed on the serve-view matrix identity: _serve_view
                # caches until the next mutation, so a fresh tuple means
                # a new epoch and the old pack is stale
                self._packed = (mat, pack_database(mat))
            rows, d2 = pallas_scan_knn_packed(
                self._packed[1], jnp.asarray(queries), k=k,
                q_tile=q_tile, oversample=oversample, probes=probes,
            )
        else:
            row_mask = (
                jnp.asarray(np.isin(ids_map, np.asarray(allowed_ids)))
                if allowed_ids is not None else None
            )
            rows, d2 = scan_knn(
                mat, jnp.asarray(queries), k=k,
                precise=True if exact is None else exact,
                row_mask=row_mask,
            )
        rows, d2 = np.asarray(rows), np.asarray(d2)
        if radius is not None:
            hit = d2 <= radius * radius
            rows = np.where(hit, rows, -1)
            d2 = np.where(hit, d2, np.inf).astype(np.float32)
        ids = np.where(rows >= 0, ids_map[np.clip(rows, 0, None)], -1)
        return ids, d2

    # --- maintenance -----------------------------------------------------------
    def _maybe_compact(self) -> None:
        main = max(1, self._main_ids.size)
        dead = main - int(self._main_alive.sum())
        churn = (len(self._delta_ids) + dead) / main
        if churn > self._rebuild_fraction and len(self) > 0:
            self.compact()

    # --- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        """Checkpoint: compacts, then saves the main index + id map."""
        import os

        self.compact()
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "state.npz"),
            main_ids=self._main_ids,
            next_id=np.int64(self._next_id),
            leaf_size=np.int64(self._leaf_size),
            rebuild_fraction=np.float64(self._rebuild_fraction),
            dims=np.int64(self._dims if self._dims is not None else -1),
            has_index=np.bool_(self._index is not None),
        )
        if self._index is not None:
            self._index.save(os.path.join(path, "index"))

    @classmethod
    def load(cls, path: str) -> "DynamicIndex":
        import os

        from vector_database_tpu.models.bsp import BSPIndex

        z = np.load(os.path.join(path, "state.npz"))
        out = cls(
            leaf_size=int(z["leaf_size"]),
            rebuild_fraction=float(z["rebuild_fraction"]),
        )
        out._next_id = int(z["next_id"])
        dims = int(z["dims"])
        out._dims = dims if dims >= 0 else None
        out._main_ids = z["main_ids"]
        out._main_alive = np.ones(out._main_ids.size, bool)
        if bool(z["has_index"]):
            out._index = BSPIndex.load(os.path.join(path, "index.npz"))
        return out

    def compact(self) -> None:
        """Rebuild the main tree over all live rows; clears the delta.
        A no-op when already compact (empty delta, no tombstones) — so
        ``save()`` on a clean index doesn't pay a full rebuild."""
        if (
            not self._delta_vecs
            and self._index is not None
            and self._main_alive.all()
        ):
            return
        self._invalidate_serve()
        parts_v, parts_i = self._live_parts()
        self._delta_vecs, self._delta_ids = [], []
        if not parts_v:
            self._index = None
            self._main_ids = np.zeros((0,), np.int64)
            self._main_alive = np.zeros((0,), bool)
            return
        vecs = np.concatenate(parts_v)
        ids = np.concatenate(parts_i)
        # donate: ``vecs`` is host-assembled, so the device transfer
        # buffer is exclusively this call's — without donation the
        # builder keeps it alive beside its permuted outputs and a 10M
        # x 96 compact needs ~17.6 GB (> one 16 GB chip, measured OOM
        # in benchmarks/probe_churn.py); with it the build peak matches
        # the plain build_index_fused(donate=True) path
        self._index = build_index_fused(
            vecs, leaf_size=self._leaf_size, donate=True
        )
        # orig_row maps sorted position -> input row; rows returned by
        # search are input rows, so ids stay input-row indexed
        self._main_ids = ids
        self._main_alive = np.ones(ids.size, bool)
