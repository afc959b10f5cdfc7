"""Out-of-core indexing: datasets larger than device memory.

The reference's scaling story is exactly this — the ~10M-vector build only
became feasible through a memory-mapped temp store after the in-RAM
parallel attempt died of page faults (reference README.md:91-98,
FileRangeStore.cs). The TPU equivalent:

- the dataset lives on the HOST (a ``NativeVectorStore`` mmap file or any
  row source);
- it is indexed in device-sized chunks: each chunk streams to HBM, gets a
  fused single-compile build, and the finished per-chunk index (node table
  + leaf-major vectors) returns to host RAM;
- queries stream the per-chunk indexes back through the device — scan or
  tree per chunk — and merge top-k / ε-results across chunks. Merging is
  exact: every member of the global top-k is in its own chunk's top-k.

This composes with the mesh paths: on a pod each host ingests its own
chunks (the ``parallel/forest.py`` layout), so the chunked index is also
the >HBM-per-chip building block.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from vector_database_tpu.builder import build_index_fused
from vector_database_tpu.models.bsp import BSPIndex
from vector_database_tpu.ops.pallas_knn import pallas_scan_knn
from vector_database_tpu.search import search as bsp_search


class ChunkedIndex:
    """Host-resident index over device-sized chunks of a large dataset.

    ``spill_dir``: when set, each chunk's leaf-major vector matrix is
    written to a disk-backed ``.npy`` memmap instead of host RAM — the
    chunks page in through the OS cache when a query streams them to the
    device. This bounds host RAM at O(node tables) regardless of dataset
    size (at 100M x 96 the vector copies alone are ~38 GB; with spill the
    index holds ~1 GB of tables). The reference's mmap temp store
    (FileRangeStore.cs), reborn as the SERVING-side spill.
    """

    def __init__(self, leaf_size: int = 16,
                 spill_dir: Optional[str] = None):
        self._leaf_size = leaf_size
        self._chunks: List[dict] = []  # host numpy node tables + vectors
        self._offsets: List[int] = []
        self._n = 0
        self._d: Optional[int] = None
        self._spill = spill_dir
        if spill_dir:
            os.makedirs(spill_dir, exist_ok=True)

    # --- building ----------------------------------------------------------
    def add_chunk(self, vectors) -> None:
        """Index one chunk (device round-trip) and keep it on host."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if self._d is None:
            self._d = vectors.shape[1]
        elif vectors.shape[1] != self._d:
            raise ValueError("invalid vector size")
        index = build_index_fused(
            jnp.asarray(vectors), leaf_size=self._leaf_size, donate=True
        )
        vec = np.asarray(index.vectors)
        if self._spill:
            path = os.path.join(
                self._spill, f"chunk{len(self._chunks)}.npy"
            )
            np.save(path, vec)
            del vec
            vec = np.load(path, mmap_mode="r")
        self._chunks.append({
            "dim": np.asarray(index.dim),
            "mid": np.asarray(index.mid),
            "low": np.asarray(index.low),
            "high": np.asarray(index.high),
            "leaf_start": np.asarray(index.leaf_start),
            "leaf_count": np.asarray(index.leaf_count),
            "vectors": vec,
            "orig_row": np.asarray(index.orig_row),
            "depth": index.depth,
            "leaf_cap": index.leaf_cap,
            "num_leaves": index.num_leaves,
        })
        # eager HBM release (GC lag across device-sized chunks adds up)
        for buf in (index.dim, index.mid, index.low, index.high,
                    index.leaf_start, index.leaf_count, index.vectors,
                    index.orig_row):
            buf.delete()
        self._offsets.append(self._n)
        self._n += vectors.shape[0]

    @classmethod
    def from_store(cls, store, chunk_rows: int = 2_000_000,
                   leaf_size: int = 16,
                   spill_dir: Optional[str] = None) -> "ChunkedIndex":
        """Build from a ``NativeVectorStore`` (or anything with
        ``.chunks(chunk_rows)``), one device-sized chunk at a time."""
        out = cls(leaf_size=leaf_size, spill_dir=spill_dir)
        for chunk in store.chunks(chunk_rows):
            out.add_chunk(chunk)
        return out

    def __len__(self) -> int:
        return self._n

    @property
    def num_chunks(self) -> int:
        return len(self._chunks)

    def _device_index(self, c: dict) -> BSPIndex:
        return BSPIndex(
            dim=jnp.asarray(c["dim"]),
            mid=jnp.asarray(c["mid"]),
            low=jnp.asarray(c["low"]),
            high=jnp.asarray(c["high"]),
            leaf_start=jnp.asarray(c["leaf_start"]),
            leaf_count=jnp.asarray(c["leaf_count"]),
            vectors=jnp.asarray(c["vectors"]),
            orig_row=jnp.asarray(c["orig_row"]),
            depth=c["depth"],
            leaf_cap=c["leaf_cap"],
            num_leaves=c["num_leaves"],
        )

    # --- queries -------------------------------------------------------------
    def knn(self, queries, k: int, **scan_kw):
        """Global k-NN: per-chunk streamed MXU scan + exact host merge.

        Returns ``(rows [Q, k], sq_dists [Q, k])`` with global row ids.
        """
        import jax

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        q = queries.shape[0]
        best_d = np.full((q, k), np.inf, np.float32)
        best_r = np.full((q, k), -1, np.int64)
        qdev = jnp.asarray(queries)
        # Double-buffer the chunk stream when HBM headroom allows: the
        # async host->HBM put of chunk i+1 overlaps chunk i's scan. At
        # device-sized chunks the scan itself peaks at ~3x chunk bytes
        # (f32 pad transient + packed blocks), so prefetching would
        # exhaust HBM — there the put is issued AFTER the scan, and the
        # consumed chunk is freed eagerly (GC lag across 4 GB buffers
        # adds up).
        hbm_budget = 14 << 30  # conservative v5e free-HBM bound
        chunk_bytes = max(
            (c["vectors"].nbytes for c in self._chunks), default=0
        )
        prefetch = 5 * chunk_bytes < hbm_budget
        dev = jax.device_put(self._chunks[0]["vectors"]) \
            if self._chunks else None
        for i, (c, off) in enumerate(zip(self._chunks, self._offsets)):
            nxt = None
            if prefetch and i + 1 < len(self._chunks):
                nxt = jax.device_put(self._chunks[i + 1]["vectors"])
            rows, d2 = pallas_scan_knn(
                dev, qdev, k=min(k, dev.shape[0]), **scan_kw
            )
            rows = np.asarray(rows)
            d2 = np.asarray(d2)
            dev.delete()
            if nxt is None and i + 1 < len(self._chunks):
                nxt = jax.device_put(self._chunks[i + 1]["vectors"])
            dev = nxt
            valid = rows >= 0
            grows = np.where(valid, c["orig_row"][np.where(valid, rows, 0)]
                             + off, -1)
            cat_d = np.concatenate([best_d, np.where(valid, d2, np.inf)], 1)
            cat_r = np.concatenate([best_r, grows], 1)
            order = np.argsort(cat_d, axis=1)[:, :k]
            best_d = np.take_along_axis(cat_d, order, 1)
            best_r = np.take_along_axis(cat_r, order, 1)
        return best_r, best_d

    def search(self, queries, radius: float):
        """Exact ε-ball over all chunks (tree walk per chunk); returns
        per-query ``(global_rows, sq_dists)``."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        out = [([], []) for _ in range(queries.shape[0])]
        for c, off in zip(self._chunks, self._offsets):
            index = self._device_index(c)
            res = bsp_search(index, queries, radius)
            for qi in range(queries.shape[0]):
                rows = np.asarray(res.rows[qi])
                d2 = np.asarray(res.sq_dists[qi])
                keep = rows >= 0
                out[qi][0].extend((rows[keep] + off).tolist())
                out[qi][1].extend(d2[keep].tolist())
        return [
            (np.asarray(r, np.int64), np.asarray(d, np.float32))
            for r, d in out
        ]

    # --- persistence -----------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {
            "leaf_size": self._leaf_size,
            "offsets": self._offsets,
            "n": self._n,
            "d": self._d,
            "chunks": len(self._chunks),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        for i, c in enumerate(self._chunks):
            np.savez_compressed(
                os.path.join(path, f"chunk_{i}.npz"),
                **{k: v for k, v in c.items()
                   if isinstance(v, np.ndarray)},
                scalars=np.array(
                    [c["depth"], c["leaf_cap"], c["num_leaves"]], np.int64
                ),
            )

    @classmethod
    def load(cls, path: str) -> "ChunkedIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        out = cls(leaf_size=meta["leaf_size"])
        out._offsets = list(meta["offsets"])
        out._n = meta["n"]
        out._d = meta["d"]
        for i in range(meta["chunks"]):
            z = np.load(os.path.join(path, f"chunk_{i}.npz"))
            depth, leaf_cap, num_leaves = (int(v) for v in z["scalars"])
            out._chunks.append({
                **{k: z[k] for k in (
                    "dim", "mid", "low", "high", "leaf_start",
                    "leaf_count", "vectors", "orig_row",
                )},
                "depth": depth,
                "leaf_cap": leaf_cap,
                "num_leaves": num_leaves,
            })
        return out
