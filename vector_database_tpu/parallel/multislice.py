"""Multi-host / multi-slice scaffolding: DCN-aware meshes and the
cross-slice index.

A TPU pod slice is a set of chips joined by ICI (fast, ~100s of GB/s per
link); multiple slices — or multiple hosts' processes — are joined by DCN
(data-center network, ~2 orders of magnitude slower). The design rule
(SURVEY.md §2.2, scaling-book): *collectives that touch per-row data ride
ICI; only k-sized results cross DCN.* Concretely:

- within a slice: ``build_index_sharded`` psums per-level segment
  statistics and all-gathers [P, S] counts — O(S)-sized, every level —
  so its mesh must be ICI-only;
- across slices: rows are *partitioned* (each slice owns n/slices rows
  and builds its own sharded global tree), and serving merges per-slice
  ``[Q, k]`` top-k results — the only cross-slice traffic.

The reference has no distributed story at all (single process, README.md
:89-98); this module is the TPU-native scale-out axis on top of it.

On a single-slice or CPU/testing topology the same code runs with
"virtual slices" (an even partition of the device list), which is how the
8-virtual-device CI exercises it.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vector_database_tpu.parallel.global_tree import (
    ShardedBSPIndex,
    build_index_sharded,
    knn_global,
    search_global,
)
from jax.sharding import Mesh

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Initialize multi-host JAX (one process per host, each seeing its
    local chips; ``jax.devices()`` becomes the global device list).

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``
    / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``; on Cloud TPU pods
    ``jax.distributed.initialize()`` autodetects all three). Returns True
    if a multi-process runtime was initialized, False for the single
    -process no-op (so tests and single-host runs call it unconditionally).
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        # single process (or TPU-pod autodetection explicitly requested
        # via kwargs); don't touch the runtime in the common local case
        if not kwargs:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    return True


def slice_groups(
    devices: Optional[Sequence] = None, n_slices: Optional[int] = None
) -> List[List]:
    """Group devices by their ICI domain.

    Real multi-slice TPU devices carry ``slice_index``; hosts' CPU
    devices (and single-slice TPUs) don't, in which case ``n_slices``
    partitions the list evenly into *virtual* slices (testing topology).
    """
    devices = list(jax.devices() if devices is None else devices)
    idx = {getattr(d, "slice_index", None) for d in devices}
    if idx != {None} and len(idx) > 1:
        groups: dict = {}
        for d in devices:
            groups.setdefault(d.slice_index, []).append(d)
        return [groups[k] for k in sorted(groups)]
    n_slices = n_slices or 1
    if len(devices) % n_slices:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices"
        )
    per = len(devices) // n_slices
    return [devices[i * per : (i + 1) * per] for i in range(n_slices)]


def make_slice_meshes(
    n_slices: Optional[int] = None, axis: str = "data"
) -> List[Mesh]:
    """One ICI-only 1-D mesh per (real or virtual) slice."""
    return [
        Mesh(np.asarray(g), (axis,)) for g in slice_groups(n_slices=n_slices)
    ]


@dataclasses.dataclass
class MultiSliceIndex:
    """Rows partitioned across slices; one sharded global tree per slice.

    ``orig_row`` of slice s maps its local rows to global row ids via
    ``offsets[s]``.
    """

    slices: List[ShardedBSPIndex]
    offsets: List[int]  # global row id of each slice's row 0
    n: int

    @property
    def num_slices(self) -> int:
        return len(self.slices)


def build_index_multislice(
    vectors,
    *,
    n_slices: Optional[int] = None,
    axis: str = "data",
    leaf_size: int = 1,
    **build_kwargs,
) -> MultiSliceIndex:
    """Partition rows across slices and build one ``build_index_sharded``
    tree per slice — per-level collectives ride ICI only; nothing row-
    sized ever crosses DCN."""
    vectors = np.asarray(vectors, np.float32)
    n = vectors.shape[0]
    meshes = make_slice_meshes(n_slices, axis=axis)
    s = len(meshes)
    if n < s:
        raise ValueError(f"need at least {s} rows for {s} slices")
    bounds = np.linspace(0, n, s + 1).astype(np.int64)
    slices, offsets = [], []
    for mesh, lo, hi in zip(meshes, bounds[:-1], bounds[1:]):
        slices.append(
            build_index_sharded(
                vectors[lo:hi], mesh, axis=axis, leaf_size=leaf_size,
                **build_kwargs,
            )
        )
        offsets.append(int(lo))
    return MultiSliceIndex(slices=slices, offsets=offsets, n=n)


def knn_multislice(
    index: MultiSliceIndex,
    queries,
    k: int,
    radius: float,
    *,
    max_leaves: int = 256,
):
    """k nearest within ``radius`` across all slices: per-slice sharded
    search + ICI top-k merge, then an exact [Q, k]-sized cross-slice
    merge (the only DCN traffic). Returns ``(rows [Q, k], sq_dists)``
    with global row ids."""
    queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
    per = [
        knn_global(sl, queries, k, radius, max_leaves=max_leaves)
        for sl in index.slices
    ]
    rows = np.concatenate(
        [
            np.where(np.asarray(r) >= 0, np.asarray(r) + off, -1)
            for (r, _), off in zip(per, index.offsets)
        ],
        axis=1,
    )
    d2 = np.concatenate([np.asarray(d) for _, d in per], axis=1)
    pick = np.argsort(d2, axis=1)[:, :k]
    out_rows = np.take_along_axis(rows, pick, axis=1)
    out_d2 = np.take_along_axis(d2, pick, axis=1)
    out_rows = np.where(np.isfinite(out_d2), out_rows, -1)
    return out_rows, out_d2


def search_multislice(
    index: MultiSliceIndex,
    queries,
    radius: float,
    *,
    max_leaves: int = 256,
):
    """Exact ε-ball across slices: per-slice ``search_global`` results
    concatenated with global row ids. Returns ``(rows [Q, C], sq_dists
    [Q, C], count [Q], overflow [Q])``."""
    queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
    all_rows, all_d2, counts, ovs = [], [], [], []
    for sl, off in zip(index.slices, index.offsets):
        rows, d2, cnt, ov = search_global(
            sl, queries, radius, max_leaves=max_leaves
        )
        rows = np.asarray(rows)
        all_rows.append(np.where(rows >= 0, rows + off, -1))
        all_d2.append(np.asarray(d2))
        counts.append(np.asarray(cnt))
        ovs.append(np.asarray(ov))
    return (
        np.concatenate(all_rows, axis=1),
        np.concatenate(all_d2, axis=1),
        np.sum(counts, axis=0),
        np.any(ovs, axis=0),
    )
