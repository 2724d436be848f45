"""Device-mesh helpers (the framework's only "communication backend").

The reference is single-process with no distributed execution (SURVEY.md §2
parallelism census); scale-out here is new design surface built entirely on
``jax.sharding``: pick a mesh, annotate shardings, let XLA insert ICI
collectives.  No NCCL/MPI/custom transports anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_mesh", "P", "NamedSharding"]


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str],
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh of the given logical shape over the available devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def data_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first ``n_devices``) devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return make_mesh((n,), (axis_name,), devices=devs[:n])
