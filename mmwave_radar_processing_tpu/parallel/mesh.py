"""Device-mesh helpers."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Dict[str, int], devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh({"data": 4, "model": 2})``.

    Axis sizes must multiply to the device count; pass ``-1`` for one axis to
    infer it.
    """
    devices = list(devices if devices is not None else jax.devices())
    sizes = dict(axes)
    unknown = [k for k, v in sizes.items() if v == -1]
    known = int(np.prod([v for v in sizes.values() if v != -1]))
    if unknown:
        if len(unknown) > 1:
            raise ValueError("at most one axis may be -1")
        sizes[unknown[0]] = len(devices) // known
    total = int(np.prod(list(sizes.values())))
    if total != len(devices):
        raise ValueError(f"mesh {sizes} does not match {len(devices)} devices")
    arr = np.asarray(devices).reshape(*sizes.values())
    return Mesh(arr, tuple(sizes.keys()))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (frame/batch) dimension over ``axis``, replicate rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
