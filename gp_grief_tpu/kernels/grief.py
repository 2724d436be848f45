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


def _phi_fused_applicable(xg, dims) -> bool:
    """Fused-Pallas Φ assembly needs equal per-dim grids (stackable operands),
    the trivial dim mapping, d ≥ 2, and a TPU backend (Mosaic)."""
    if dims is not None or len(xg) < 2:
        return False
    m0 = int(xg[0].shape[0])
    if any(int(g.shape[0]) != m0 for g in xg):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _phi_fused_operands(basis: GriefBasis, Kx) -> Tuple[jax.Array, jax.Array]:
    """Stacked operands for the fused Pallas Φ kernel.

    ``B_stack[d] = K_xU_d`` (the raw cross-covariances); the ``Q_d`` rotation,
    the column selection, and the ``λ^{-1/2}`` normalization all fold into one
    selection operand ``S_d = Q_d[:, idx_d] · λ_d[idx_d]^{-1/2}`` — so the
    in-kernel per-dim dot ``(n, m)·(m, p)`` replaces matmul+gather+scale and
    the d pre-rotation matmuls disappear entirely.
    """
    tiny = jnp.finfo(Kx[0].dtype).tiny
    B_stack = jnp.stack(Kx, axis=0)  # (d, n, m)
    S_cols = []
    for dd in range(len(Kx)):
        cols = basis.idx[:, dd]  # (p,)
        log_lam_d = jnp.log(jnp.clip(basis.lams[dd], tiny, None))
        scale = jnp.exp(-0.5 * jnp.take(log_lam_d, cols))  # (p,)
        S_cols.append(basis.Qs[dd][:, cols] * scale[None, :])  # (m, p)
    return B_stack, jnp.stack(S_cols, axis=0)  # (d, m, p)


def phi(
    basis: GriefBasis,
    kernels: Union[Stationary, KernList],
    xg: Sequence[jax.Array],
    x: jax.Array,
    *,
    dims: Optional[Sequence[Sequence[int]]] = None,
    impl: str = "auto",
) -> jax.Array:
    """Evaluate the ``(n, p)`` normalized eigenfunction features at ``x``.

    Per dimension: one ``(n, m_d) × (m_d, m_d)`` MXU matmul, a column gather,
    a per-column ``λ^{-1/2}`` scale, and a running elementwise product —
    ``O(n·Σ m_d² + n·p·d)`` total (reference §3.1 "build Φ" / §3.3 Nyström
    extension at test points).

    ``impl``: ``"auto"`` uses the fused Pallas assembly
    (:func:`gp_grief_tpu.ops.pallas.phi_fused_pallas` — all ``d`` dimensions
    multiplied in VMEM, one pass over the ``(n, p)`` accumulator instead of
    ``d``) when it applies: TPU backend, equal per-dim grids, trivial dim
    mapping.  ``"xla"`` forces the per-dim loop; ``"fused"`` requires the
    fused path (raises if inapplicable).  Both paths are differentiable and
    run all dots at ``HIGHEST`` precision; accuracy study at the NLML level:
    ``benchmarks/RESULTS_r2.md``.
    """
    with jax.named_scope("grief_phi"):
        Kx = cross_cov_grid(kernels, x, xg, dims)
        tiny = jnp.finfo(Kx[0].dtype).tiny
        use_fused = impl != "xla" and _phi_fused_applicable(xg, dims)
        if impl == "fused" and not use_fused:
            raise ValueError(
                "phi(impl='fused') needs a TPU backend, equal per-dim grids, "
                "and no dim grouping"
            )
        if use_fused:
            from gp_grief_tpu.ops.pallas import phi_fused_pallas

            B_stack, S_stack = _phi_fused_operands(basis, Kx)
            return phi_fused_pallas(B_stack, S_stack)
        out = None
        for d in range(len(xg)):
            B = Kx[d] @ basis.Qs[d]
            cols = basis.idx[:, d]
            log_lam_d = jnp.log(jnp.clip(basis.lams[d], tiny, None))
            G = jnp.take(B, cols, axis=1) * jnp.exp(-0.5 * jnp.take(log_lam_d, cols))
            out = G if out is None else out * G
        return out
