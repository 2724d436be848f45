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

__all__ = ["make_mesh", "data_mesh", "init_distributed", "P", "NamedSharding"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host (DCN) initialization for multi-slice meshes.

    SURVEY §5 distributed-comm row: ICI collectives cover a single slice;
    crossing slices (or hosts) needs ``jax.distributed.initialize`` BEFORE
    any backend use, after which ``jax.devices()`` spans every process and
    the ordinary :func:`make_mesh` / model ``mesh=`` kwargs work unchanged —
    shardings whose inner axis stays within a slice ride ICI, the outer axis
    crosses DCN.

    Single-process (the common case, and everything this environment can
    exercise): a NO-OP returning 1 — decided from environment variables
    ONLY, never by probing jax (``jax.process_count()`` would initialize
    the local backend, after which ``jax.distributed.initialize`` refuses
    to run).  Multi-process: call this BEFORE any other jax use, passing
    the coordinator address etc. explicitly, or with no arguments in an
    environment that announces a coordinator
    (``$COORDINATOR_ADDRESS`` / ``$MEGASCALE_COORDINATOR_ADDRESS``, or
    ``$TPU_WORKER_HOSTNAMES`` listing MORE THAN ONE host — a single-entry
    hostname list is the normal single-host Cloud TPU VM case, where
    auto-initializing would hang; such environments must pass explicit
    arguments).  Returns ``jax.process_count()`` (1 on the no-op path).
    """
    import os
    import warnings

    explicit = any(a is not None for a in (coordinator_address, num_processes, process_id))
    # TPU_WORKER_HOSTNAMES is routinely present on SINGLE-host Cloud TPU VMs
    # (where auto-initializing would hang waiting for a coordinator that
    # never answers), so it only counts as a multi-process signal when it
    # lists MORE than one hostname.
    multi_worker = len([
        h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()
    ]) > 1
    announced = (
        any(k in os.environ for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
        or multi_worker
    )
    if not explicit and not announced:
        return 1  # bare single process (or single-host TPU VM): touch nothing
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Backend already initialized (or double call): report what we have
        # rather than crashing a program that may still be single-process.
        warnings.warn(
            f"init_distributed: jax.distributed.initialize failed ({e}); "
            "call init_distributed() before any other jax use",
            stacklevel=2,
        )
    return jax.process_count()


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
