"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis: str = "data"
) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    data: int, model: int, axes: Sequence[str] = ("data", "model")
) -> Mesh:
    """A 2-D mesh: rows sharded over ``data``, vector dims over ``model``
    (the TP axis for wide vectors, SURVEY.md §2.2)."""
    devices = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, tuple(axes))


def shard_rows(array, mesh: Mesh, axis: str = "data"):
    """Place ``array`` with its leading dim sharded over ``mesh[axis]``."""
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))
