"""Data-parallel GP-GRIEF training over a device mesh (`shard_map` + psum).

New design surface with no reference counterpart (SURVEY.md §2 parallelism
census): the reference scales *algorithmically* (Kronecker structure +
eigenfunction truncation); here the remaining ``O(n)`` work — feature
evaluation and the ``ΦᵀΦ`` / ``Φᵀy`` reductions — is sharded over the data
axis of a mesh, with the p×p reductions ``psum``-ed over ICI:

    device k holds rows X_k, y_k:
        Φ_k = φ(X_k)                     (local: d MXU matmuls + gathers)
        C   = Σ_k Φ_kᵀ Φ_k   → psum      (p×p, crosses ICI once)
        v   = Σ_k Φ_kᵀ y_k   → psum      (p,)
    every device then computes the identical O(p³) NLML and its gradient.

The basis build itself is replicated (it is O(Σ m_d³), tiny) — or, with a 2-D
``(data, model)`` mesh, its batched per-dimension ``eigh`` is sharded over the
``model`` axis via a sharding constraint (see ``stacked_eigh_sharded``).

Everything is differentiable: ``jax.grad`` flows through ``shard_map`` and the
psums, so one jitted program computes the sharded NLML *and* its gradient with
two ICI reductions total per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gp_grief_tpu.kernels.grief import GriefBasis, build_basis, phi
from gp_grief_tpu.models.base import BasisStats, basis_nlml

__all__ = [
    "pad_to_multiple",
    "sharded_basis_stats",
    "sharded_grief_nlml",
    "stacked_eigh_sharded",
]


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``x`` with zeros along ``axis`` to a multiple; return (padded, mask).

    The mask (1 real / 0 pad) is applied as a row weight: padded rows then
    contribute nothing to ``ΦᵀΦ``/``Φᵀy``/``yᵀy``.
    """
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    pad_n = target - n
    mask = np.ones((target,), dtype=x.dtype)
    if pad_n:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad_n)
        x = np.pad(x, widths)
        mask[n:] = 0.0
    return x, mask


def sharded_basis_stats(
    basis: GriefBasis,
    kernels,
    xg,
    x: jax.Array,
    y: jax.Array,
    row_mask: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    n_real: Optional[int] = None,
) -> BasisStats:
    """``BasisStats`` with rows of ``(x, y)`` sharded over ``axis_name``."""
    n = int(n_real if n_real is not None else x.shape[0])

    def local(xk, yk, mk):
        Phik = phi(basis, kernels, xg, xk) * mk[:, None]
        yk = yk * mk
        C = lax.psum(Phik.T @ Phik, axis_name)
        v = lax.psum(Phik.T @ yk, axis_name)
        yy = lax.psum(jnp.dot(yk, yk), axis_name)
        return C, v, yy

    spec_rows = P(axis_name)
    C, v, yy = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), spec_rows, spec_rows),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(x, y, row_mask)
    return BasisStats(C=C, v=v, yy=yy, n=n)


def sharded_grief_nlml(
    params,
    xg,
    x: jax.Array,
    y: jax.Array,
    row_mask: jax.Array,
    mesh: Mesh,
    *,
    n_eigs: int,
    dim_noise_var: float = 1e-12,
    axis_name: str = "data",
    n_real: Optional[int] = None,
) -> jax.Array:
    """Full data-parallel NLML: replicated basis build + sharded reductions.

    ``params``: ``{"kernels": [...], "log_w": (p,), "log_noise": ()}`` —
    differentiable end to end, including through the basis build
    (``opt_kernel_params`` semantics).
    """
    basis = build_basis(params["kernels"], xg, n_eigs, dim_noise_var=dim_noise_var)
    stats = sharded_basis_stats(
        basis, params["kernels"], xg, x, y, row_mask, mesh,
        axis_name=axis_name, n_real=n_real,
    )
    return basis_nlml(stats, params["log_w"], params["log_noise"])


def stacked_eigh_sharded(Ks: jax.Array, mesh: Mesh, axis_name: str = "model"):
    """Batched symmetric eigh of stacked equal-size factors ``(d, m, m)``,
    sharded over the ``model`` mesh axis (model parallelism over grid
    dimensions — SURVEY.md §2 parallelism table, "tensor/model parallelism").

    A sharding constraint on the batch axis lets XLA place each factor's
    ``eigh`` on its owning device and all-gather only the small results.
    """
    sharding = NamedSharding(mesh, P(axis_name, None, None))
    Ks = lax.with_sharding_constraint(Ks, sharding)
    lams, Qs = jax.vmap(jnp.linalg.eigh)(Ks)
    rep = NamedSharding(mesh, P())
    return (
        lax.with_sharding_constraint(Qs, rep),
        lax.with_sharding_constraint(lams, rep),
    )
