"""GRIEF eigenfunction basis: grid-structured Nyström features.

Re-design of the reference's ``GriefKernel`` (reference: ``gp_grief/kern.py``,
class ``GriefKernel`` — SURVEY.md §2 #13; algorithm from Evans & Nair,
ICML 2018).  The kernel is a truncated Nyström eigenfunction expansion on a
Cartesian inducing grid:

    k_GRIEF(x, z) = Σ_{j=1}^p w_j φ_j(x) φ_j(z),
    φ_j(x) = λ_j^{-1/2} · k(x, U) q_j,

where ``(λ_j, q_j)`` are the top-p eigenpairs of ``K_UU = ⊗_d K_d``.  Because
``q_j = ⊗_d q_{d, i_d(j)}`` factorizes, the feature matrix is a row/col-selected
Khatri-Rao product:

    Φ[i, j] = Π_d ( [K_xU_d Q_d][i, idx[j,d]] · λ_{d, idx[j,d]}^{-1/2} ),

with per-dimension normalization applied *inside* the product so intermediates
stay O(1) even at d=100 where the raw products span hundreds of orders of
magnitude (SURVEY.md §7 hard-part 2).  With ``w ≡ 1`` this reproduces the
Nyström kernel ``K_xU K_UU⁻¹ K_Ux`` exactly at ``p = m``.

Everything here is one jittable, differentiable function of the kernel
hyperparameters: batched per-dim ``eigh`` (MXU-friendly), exact log-space
``top_p_kron_eigs`` selection, MXU matmuls ``K_xU_d Q_d``, and a gather+product
assembly (the reference's "row-selection products", BASELINE.json:5) — so
``opt_kernel_params=True`` (rebuilding the eigenbasis every NLML evaluation,
SURVEY.md §3.2) is just including these ops in the traced objective.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from gp_grief_tpu.kernels.base import param_dataclass
from gp_grief_tpu.kernels.grid import KernList, cov_grid, cross_cov_grid
from gp_grief_tpu.kernels.stationary import Stationary
from gp_grief_tpu.ops.kron import kron_eigh
from gp_grief_tpu.ops.topk import top_p_kron_eigs

__all__ = ["GriefBasis", "build_basis", "phi"]


@param_dataclass
class GriefBasis:
    """Eigenfunction basis state (a pytree; all leaves are arrays).

    * ``Qs``: per-dimension eigenvector matrices ``(m_d, m_d)``.
    * ``lams``: per-dimension eigenvalue vectors ``(m_d,)`` (eigh order).
    * ``log_lam``: ``(p,)`` selected ``log Π_d λ`` — descending.
    * ``idx``: ``(p, d)`` int32 per-dimension eigenvector column selections.
    """

    Qs: Tuple[jax.Array, ...]
    lams: Tuple[jax.Array, ...]
    log_lam: jax.Array
    idx: jax.Array


def build_basis(
    kernels: Union[Stationary, KernList],
    xg: Sequence[jax.Array],
    p: int,
    *,
    dim_noise_var: float = 1e-12,
) -> GriefBasis:
    """Build the eigenfunction basis: d small ``eigh``s + top-p selection.

    This is the reference's §3.1 construction stack (``GridKernel.cov_grid`` →
    ``KronMatrix.schur()`` → top-p Kronecker eigenvalue selection) as a single
    jitted program.  ``dim_noise_var`` is the per-dimension jitter stabilizing
    both the factor ``eigh`` and its gradient at near-degenerate eigenvalues
    (SURVEY.md §7 hard-part 4).
    """
    # Clamp p to the lattice size when it is countable (asking for more
    # eigenfunctions than exist would otherwise pad the basis with duplicated
    # columns); for astronomically large grids the product is never the binding
    # constraint.
    log_total = sum(math.log(int(g.shape[0])) for g in xg)
    if log_total < math.log(2**62):
        p = min(p, math.prod(int(g.shape[0]) for g in xg))
    with jax.named_scope("grief_build_basis"):
        Ks = cov_grid(kernels, xg, dim_noise_var=dim_noise_var)
        Qs, lams = kron_eigh(Ks)
        log_lam, idx = top_p_kron_eigs(lams, p)
        return GriefBasis(Qs=Qs, lams=lams, log_lam=log_lam, idx=idx)


def phi(
    basis: GriefBasis,
    kernels: Union[Stationary, KernList],
    xg: Sequence[jax.Array],
    x: jax.Array,
    *,
    dims: Optional[Sequence[Sequence[int]]] = None,
) -> jax.Array:
    """Evaluate the ``(n, p)`` normalized eigenfunction features at ``x``.

    Per dimension: one ``(n, m_d) × (m_d, m_d)`` MXU matmul, a column gather,
    a per-column ``λ^{-1/2}`` scale, and a running elementwise product —
    ``O(n·Σ m_d² + n·p·d)`` total (reference §3.1 "build Φ" / §3.3 Nyström
    extension at test points).
    """
    with jax.named_scope("grief_phi"):
        Kx = cross_cov_grid(kernels, x, xg, dims)
        tiny = jnp.finfo(Kx[0].dtype).tiny
        out = None
        for d in range(len(xg)):
            B = Kx[d] @ basis.Qs[d]
            cols = basis.idx[:, d]
            log_lam_d = jnp.log(jnp.clip(basis.lams[d], tiny, None))
            G = jnp.take(B, cols, axis=1) * jnp.exp(-0.5 * jnp.take(log_lam_d, cols))
            out = G if out is None else out * G
        return out
