"""GP-GRIEF model: O(n·p + p³) exact inference with grid eigenfunctions.

Re-design of the reference's ``GPGriefModel`` (reference:
``gp_grief/models.py``, class ``GPGriefModel`` — SURVEY.md §2 #17; Evans &
Nair ICML 2018).  The kernel is ``k(x,z) = Σ_j w_j φ_j(x) φ_j(z)`` with the
GRIEF eigenfunction basis (``kernels/grief.py``); NLML and prediction use the
matrix inversion + determinant lemmas (see ``models/base.py``), so after the
one-time O(n·p²) basis reductions every NLML evaluation is O(p³) regardless of
``n`` or the 10^100+ virtual inducing-point count.

Two training regimes (reference flags, SURVEY.md §2 #13/#17):

* ``reweight_eig_funs`` (default): train ``log w`` (p,) and the noise — the
  basis is fixed, ``ΦᵀΦ``/``Φᵀy`` are cached, each step is O(p³).
* ``opt_kernel_params``: also train the base-kernel hyperparameters — the
  whole §3.1 stack (per-dim eigh → top-p selection → Φ → reductions) is traced
  into the objective and differentiated by ``jax.grad`` (the reference
  rebuilds this per finite-difference probe; here it is one reverse-mode pass).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu.grid import InducingGrid
from gp_grief_tpu.kernels.base import inverse_positive
from gp_grief_tpu.kernels.grief import GriefBasis, build_basis, phi
from gp_grief_tpu.kernels.stationary import Stationary
from gp_grief_tpu.models.base import BaseModel, BasisStats, basis_nlml, basis_posterior

__all__ = ["GPGriefModel"]


class GPGriefModel(BaseModel):
    """Reference API: ``GPGriefModel(x, y, kern_list, grid, n_eigs, noise_var, ...)``."""

    def __init__(
        self,
        x,
        y,
        kern_list: Union[Stationary, Sequence[Stationary]],
        grid: Optional[InducingGrid] = None,
        *,
        n_eigs: int = 100,
        noise_var: float = 1.0,
        reweight_eig_funs: bool = True,
        opt_kernel_params: bool = False,
        dim_noise_var: float = 1e-12,
        mbar: int = 10,
        dtype=None,
    ):
        x = jnp.asarray(x, dtype=dtype)
        y = jnp.asarray(y, dtype=dtype).reshape(-1)
        if x.ndim == 1:
            x = x[:, None]
        if grid is None:
            grid = InducingGrid.build(np.asarray(x), mbar=mbar)
        self.x, self.y = x, y
        self.grid = grid
        self.xg = tuple(jnp.asarray(g, dtype=x.dtype) for g in grid.xg)
        # Mirror build_basis's clamp so log_w matches the realizable basis size.
        self.n_eigs = int(n_eigs)
        if grid.log10_num_virtual < 18:  # lattice countable in int64
            self.n_eigs = min(self.n_eigs, int(np.prod(grid.grid_shape)))
        self.reweight_eig_funs = bool(reweight_eig_funs)
        self.opt_kernel_params = bool(opt_kernel_params)
        self.dim_noise_var = float(dim_noise_var)
        kerns = (
            list(kern_list)
            if isinstance(kern_list, (list, tuple))
            else [kern_list] * grid.grid_dim
        )
        if len(kerns) != grid.grid_dim:
            raise ValueError(f"need {grid.grid_dim} kernels, got {len(kerns)}")

        self.params = {
            "log_w": jnp.zeros((self.n_eigs,), dtype=x.dtype),
            "log_noise": inverse_positive(noise_var).astype(x.dtype),
            "kernels": kerns,
        }
        if not self.opt_kernel_params:
            # Fixed basis: build once, cache the O(n·p²) reductions.
            self._refresh_cache()

    # -- basis plumbing ------------------------------------------------------

    def _build(self, kerns) -> GriefBasis:
        return build_basis(kerns, self.xg, self.n_eigs, dim_noise_var=self.dim_noise_var)

    def _stats_from(self, kerns, basis: GriefBasis) -> BasisStats:
        Phi = phi(basis, kerns, self.xg, self.x)
        return BasisStats(
            C=Phi.T @ Phi,
            v=Phi.T @ self.y,
            yy=jnp.dot(self.y, self.y),
            n=self.x.shape[0],
        )

    def _refresh_cache(self):
        self._basis = jax.jit(self._build)(self.params["kernels"])
        self._stats = jax.jit(self._stats_from)(self.params["kernels"], self._basis)

    # -- NLML ---------------------------------------------------------------

    def _loss(self, params):
        log_w = params["log_w"]
        if not self.reweight_eig_funs:
            log_w = jax.lax.stop_gradient(log_w)
        if self.opt_kernel_params:
            basis = self._build(params["kernels"])
            stats = self._stats_from(params["kernels"], basis)
        else:
            stats = self._stats
        return basis_nlml(stats, log_w, params["log_noise"])

    def optimize(self, **kwargs):
        res = super().optimize(**kwargs)
        if self.opt_kernel_params:
            self._refresh_cache()  # re-anchor the cached basis at the optimum
        return res

    # -- prediction ----------------------------------------------------------

    def predict(self, x_new, compute_var: bool = True, include_noise: bool = False):
        """O(n*·p) mean, O(n*·p²) variance via the weight-space posterior
        (reference §3.3: Nyström extension at test points)."""
        x_new = jnp.asarray(x_new, dtype=self.x.dtype)
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        if self.opt_kernel_params:
            self._refresh_cache()

        if not hasattr(self, "_predict_jit"):

            def _predict(params, basis, stats, x_new):
                kerns = params["kernels"]
                Lp, theta = basis_posterior(
                    stats, params["log_w"], params["log_noise"]
                )
                Phis = phi(basis, kerns, self.xg, x_new)
                mean = Phis @ theta
                sigma2 = jnp.exp(params["log_noise"])
                A = jax.scipy.linalg.solve_triangular(Lp, Phis.T, lower=True)
                var = sigma2 * jnp.sum(A**2, axis=0)
                return mean, var, sigma2

            self._predict_jit = jax.jit(_predict)
        mean, var, sigma2 = self._predict_jit(self.params, self._basis, self._stats, x_new)
        if not compute_var:
            return np.asarray(mean)
        if include_noise:
            var = var + sigma2
        return np.asarray(mean), np.asarray(var)
