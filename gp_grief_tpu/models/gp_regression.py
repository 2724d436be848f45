"""Exact GP regression — the framework's parity oracle and small-n model.

Re-design of the reference's ``GPRegression`` (reference:
``gp_grief/models.py``, class ``GPRegression`` — SURVEY.md §2 #16): zero-mean
GP with Gaussian noise, NLML via Cholesky, predictive mean/variance via
triangular solves.  The NLML is a pure jitted function of the hyperparameter
pytree; ``jax.grad`` replaces the reference's finite differences.

For large n the Cholesky is replaced by the iterative path: CG solves for the
quadratic term/predictions and SLQ for the log-det (``solver="iterative"``,
reference ``linalg.py`` CG + stochastic Lanczos — SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gp_grief_tpu.kernels.base import inverse_positive
from gp_grief_tpu.kernels.diag import cov_diag
from gp_grief_tpu.kernels.grid import product_cov
from gp_grief_tpu.kernels.stationary import Stationary
from gp_grief_tpu.models.base import BaseModel, check_xy
from gp_grief_tpu.ops.cg import cg_solve
from gp_grief_tpu.ops.lanczos import slq_logdet
from gp_grief_tpu.ops.precond import lowrank_sqrt_ops_from_factor, pivoted_cholesky
from gp_grief_tpu.ops.solve import logdet_from_chol

__all__ = ["GPRegression"]

KernelLike = Union[Stationary, Sequence[Stationary]]


def _cov_any(kernels: KernelLike, x, z=None):
    """Gram of a single kernel (any callable kernel object) or a product of
    per-dimension kernels (list/tuple)."""
    if not isinstance(kernels, (list, tuple)):
        return kernels(x, z)
    return product_cov(list(kernels), x, z)


def gp_nlml(kernels: KernelLike, log_noise, x, y) -> jax.Array:
    """Exact NLML: ``½ yᵀK̃⁻¹y + ½log|K̃| + (n/2)log 2π``, ``K̃ = K + σ²I``."""
    n = x.shape[0]
    K = _cov_any(kernels, x)
    sigma2 = jnp.exp(log_noise)
    L = jnp.linalg.cholesky(K + sigma2 * jnp.eye(n, dtype=K.dtype))
    a = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    return 0.5 * (jnp.sum(a**2) + logdet_from_chol(L) + n * jnp.log(2.0 * jnp.pi))


def gp_nlml_iterative(
    kernels: KernelLike,
    log_noise,
    x,
    y,
    *,
    key,
    num_probes: int = 32,
    lanczos_iters: int = 64,
    cg_tol: float = 1e-8,
    cg_iters: int = 1000,
    precond_rank: int = 0,
) -> jax.Array:
    """Large-n NLML: CG quadratic form + SLQ log-det, BBMM-style gradients.

    ``precond_rank=r > 0`` enables the GPyTorch-style pivoted-Cholesky
    preconditioner (PAPERS.md): ``K ≈ L Lᵀ`` with ``L (n, r)`` greedy on the
    largest remaining diagonal, ``M = LLᵀ + σ²I``.  CG runs with the spectral
    ``M⁻¹`` hook and the log-det becomes *whitened SLQ*
    ``log|M| (exact) + log|M⁻½ÃM⁻½|`` — smooth-kernel Grams are routinely
    κ ≳ 1/ε_f32 at large n, where unpreconditioned f32 CG/SLQ silently fail
    (the SKI analysis in RESULTS_r4.md §6 applies verbatim to the dense
    operator).  The preconditioner is value-only (built under
    ``stop_gradient``); gradients flow through the BBMM surrogates as before.

    Gradients do NOT flow through the Lanczos recurrence (noisy/biased).
    Instead the value carries stop-gradient surrogates whose autodiff yields
    the exact stochastic identities (GPyTorch BBMM, PAPERS.md):

        ∂ yᵀÃ⁻¹y      = −αᵀ (∂Ã) α,                α  = Ã⁻¹y   (CG)
        ∂ log|Ã|       = tr(Ã⁻¹ ∂Ã) ≈ (1/R) Σ_r s_rᵀ (∂Ã) z_r,  s_r = Ã⁻¹z_r

    One batched CG solves for ``[y, z_1..z_R]`` simultaneously; SLQ supplies
    the log-det *value* only.
    """
    n = x.shape[0]
    sigma2 = jnp.exp(log_noise)
    K = _cov_any(kernels, x)  # swap for a chunked matvec closure at 2M scale

    # Batch-major operator (vv (B, n) rows; K symmetric): solver state keeps
    # the long axis on TPU lanes — see ops/cg.py:_reducers.  HIGHEST: the
    # TPU-default bf16 product breaks the SPD-consistency solver iterations
    # need (the r5 uci2m hunt, RESULTS_r5.md §7 — applies verbatim here).
    def mv(vv):
        return (
            jnp.matmul(vv, K, precision=jax.lax.Precision.HIGHEST)
            + sigma2 * vv
        )

    pre = None
    if precond_rank > 0:
        # Value-only: stop_gradient(K) removes the (unused) eigh/cholesky
        # backward graph entirely — its VJP can emit NaN·0 on degenerate
        # spectra even under zero cotangents.
        Lpc = pivoted_cholesky(lax.stop_gradient(K), min(int(precond_rank), n))
        pre = lowrank_sqrt_ops_from_factor(
            Lpc, lax.stop_gradient(sigma2), layout="bm"
        )

    z = jax.random.rademacher(key, (num_probes, n), dtype=y.dtype)
    rhs = jnp.concatenate([y[None, :], z], axis=0)
    # Value-only solve (solutions are stop-gradiented below; gradients flow
    # through the BBMM surrogates) — skip the custom_linear_solve wrapper.
    if pre is not None:
        # Solve in the WHITENED basis (Ã⁻¹r = M⁻½ W̃⁻¹ M⁻½ r): data-space
        # PCG freezes whenever σ² < ε_f32·λmax — the deflated directions'
        # curvature sits below the matvec's output rounding (RESULTS_r5.md
        # §7; trained-optimum σ² routinely gets there).  The preconditioner
        # is stop-grad, so the gradient surrogates below are unaffected.
        M_inv_sqrt_ = pre[1]
        solw = cg_solve(
            lambda vv: M_inv_sqrt_(mv(M_inv_sqrt_(vv))),
            M_inv_sqrt_(rhs), tol=cg_tol, max_iters=cg_iters, layout="bm",
            implicit_diff=False,
        )
        sol = M_inv_sqrt_(solw)
    else:
        sol = cg_solve(mv, rhs, tol=cg_tol, max_iters=cg_iters, layout="bm",
                       implicit_diff=False)
    alpha = lax.stop_gradient(sol[0])
    S = lax.stop_gradient(sol[1:])

    # Quadratic term surrogate: value yᵀα, gradient −αᵀ(∂Ã)α.
    quad = 2.0 * jnp.dot(y, alpha) - jnp.dot(alpha, mv(alpha[None, :])[0])

    # Log-det: SLQ value (stop-grad) + Hutchinson-gradient surrogate.
    # With a preconditioner, SLQ runs whitened: the clustered spectrum of
    # M⁻½ÃM⁻½ converges in a handful of quadrature nodes.
    if pre is not None:
        M_inv_sqrt, ld_off = pre[1], pre[2]
        slq_mv = lambda vv: M_inv_sqrt(mv(M_inv_sqrt(vv)))  # noqa: E731
    else:
        slq_mv, ld_off = mv, 0.0
    ld_val = lax.stop_gradient(
        ld_off
        + slq_logdet(
            slq_mv, n, key=jax.random.fold_in(key, 1), num_probes=num_probes,
            lanczos_iters=lanczos_iters, dtype=y.dtype, layout="bm",
        )
    )
    g_sur = jnp.sum(S * mv(z)) / num_probes
    ld = ld_val + g_sur - lax.stop_gradient(g_sur)

    return 0.5 * (quad + ld + n * jnp.log(2.0 * jnp.pi))


class GPRegression(BaseModel):
    """Exact GP regression (reference API: ``GPRegression(x, y, kernel, noise_var)``)."""

    def __init__(
        self,
        x,
        y,
        kernel: KernelLike,
        noise_var: float = 1.0,
        *,
        solver: str = "cholesky",
        num_probes: int = 32,
        lanczos_iters: int = 64,
        cg_tol: float = 1e-8,
        cg_iters: int = 1000,
        precond_rank: int = 0,
        key=None,
    ):
        """``solver``: ``"cholesky"`` (exact, O(n³)) or ``"iterative"``
        (CG + SLQ — the reference's large-n path, SURVEY.md §3.2).
        ``precond_rank``: rank of the pivoted-Cholesky preconditioner for the
        iterative path (0 = off); see :func:`gp_nlml_iterative`.

        The iterative objective holds its probe set fixed across optimizer
        steps (sample-average approximation): the optimized surface is
        deterministic and ``fit``'s convergence checks stay meaningful;
        pass a fresh ``key`` between ``optimize`` calls to redraw."""
        x, y = check_xy(x, y)
        if solver not in ("cholesky", "iterative"):
            raise ValueError("solver must be 'cholesky' or 'iterative'")
        self.x, self.y = x, y
        self.solver = solver
        self._iter_opts = dict(
            num_probes=num_probes, lanczos_iters=lanczos_iters,
            cg_tol=cg_tol, cg_iters=cg_iters, precond_rank=precond_rank,
        )
        self._key = jax.random.PRNGKey(0) if key is None else key
        self.params = {
            "kernel": kernel,
            "log_noise": inverse_positive(noise_var),
        }

    @property
    def noise_var(self) -> float:
        return float(jnp.exp(self.params["log_noise"]))

    def _loss(self, params):
        if self.solver == "iterative":
            return gp_nlml_iterative(
                params["kernel"], params["log_noise"], self.x, self.y,
                key=self._key, **self._iter_opts,
            )
        return gp_nlml(params["kernel"], params["log_noise"], self.x, self.y)

    def predict(self, x_new, compute_var: bool = True, include_noise: bool = False):
        """Predictive mean (and variance): ``K_*X K̃⁻¹ y`` / Schur diagonal."""
        x_new = jnp.asarray(x_new)
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        if not hasattr(self, "_predict_jit"):

            def _predict(params, x_new):
                kern, log_noise = params["kernel"], params["log_noise"]
                n = self.x.shape[0]
                K = _cov_any(kern, self.x)
                sigma2 = jnp.exp(log_noise)
                L = jnp.linalg.cholesky(K + sigma2 * jnp.eye(n, dtype=K.dtype))
                alpha = jax.scipy.linalg.solve_triangular(
                    L.T,
                    jax.scipy.linalg.solve_triangular(L, self.y, lower=True),
                    lower=False,
                )
                Ks = _cov_any(kern, x_new, self.x)  # (n*, n)
                mean = Ks @ alpha
                A = jax.scipy.linalg.solve_triangular(L, Ks.T, lower=True)  # (n, n*)
                prior_diag = cov_diag(kern, x_new)
                var = prior_diag - jnp.sum(A**2, axis=0)
                return mean, jnp.maximum(var, 0.0), sigma2

            self._predict_jit = jax.jit(_predict)
        mean, var, sigma2 = self._predict_jit(self.params, x_new)
        if not compute_var:
            return np.asarray(mean)
        if include_noise:
            var = var + sigma2
        return np.asarray(mean), np.asarray(var)
