"""Decompose the uci2m slq_cg_nlml_gap regression (0.13% in r2 → 6.2% now).

Computes the closed-form quad and log-det separately (both exact via the
p×p system) and compares each against the iterative path's pieces, with CG
convergence info — pinpoints CG-underconvergence (breakdown-guard freeze?)
vs SLQ bias.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5f_uci2m_gap.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import gp_grief_tpu as gpx
from gp_grief_tpu.ops.cg import cg_solve
from gp_grief_tpu.ops.lanczos import slq_logdet
from gp_grief_tpu.ops.precond import lowrank_sqrt_ops
from gp_grief_tpu.utils.closure import explicit_closure


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_900_000
    dtype = np.float32
    rng = np.random.default_rng(0)
    d = 10
    x = rng.uniform(-1, 1, size=(n, d)).astype(dtype)
    f = (np.sin(2 * x[:, 0]) * np.cos(x[:, 1]) + 0.4 * x[:, 2] * x[:, 3]
         + np.tanh(x[:, 4] + x[:, 5]))
    y = (f + 0.1 * rng.standard_normal(n)).astype(dtype)

    grid = gpx.InducingGrid.build(x[:200000], mbar=10)
    model = gpx.GPGriefModel(
        x, y, gpx.make_kernel("rbf", lengthscale=1.0, input_dim=1), grid,
        n_eigs=400, noise_var=0.2, dtype=dtype,
    )
    model._ensure_cache()

    from gp_grief_tpu.kernels.grief import phi as _phi

    params = model.params
    r = 300

    def pieces(params, key):
        Phi = _phi(model._basis, params["kernels"], model.xg, model.x,
                   dims=model.dims, impl=model.phi_impl)
        w = jnp.exp(params["log_w"])
        sigma2 = jnp.exp(params["log_noise"])
        # closed-form quad + logdet via the p×p system (exact oracle)
        C = jnp.matmul(Phi.T, Phi, precision=jax.lax.Precision.HIGHEST)
        v = Phi.T @ model.y
        P = C + jnp.diag(sigma2 / w)
        L = jnp.linalg.cholesky(P)
        Lv = jax.scipy.linalg.solve_triangular(L, v, lower=True)
        yy = jnp.dot(model.y, model.y)
        quad_cl = (yy - jnp.sum(Lv**2)) / sigma2
        p = C.shape[0]
        ld_cl = (2 * jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.log(w))
                 + (n - p) * jnp.log(sigma2))

        def mv(vv):
            return ((vv @ Phi) * w[None, :]) @ Phi.T + sigma2 * vv

        sw = jnp.sqrt(w)
        lam_all, V = jnp.linalg.eigh(sw[:, None] * C * sw[None, :])
        lam_r = jnp.maximum(lam_all[-r:], jnp.finfo(jnp.float32).tiny)
        Vr = V[:, -r:]
        U = Phi @ (sw[:, None] * Vr / jnp.sqrt(lam_r)[None, :])
        # basis quality: orthonormality defect of U
        G = jnp.matmul(U.T, U, precision=jax.lax.Precision.HIGHEST)
        defect = jnp.max(jnp.abs(G - jnp.eye(r, dtype=G.dtype)))
        M_inv, M_inv_sqrt, ld_M = lowrank_sqrt_ops(U, lam_r, sigma2, layout="bm")
        alpha, info = cg_solve(
            mv, model.y, tol=1e-5, max_iters=300, M_inv=M_inv, layout="bm",
            implicit_diff=False, return_info=True,
        )
        quad_it = jnp.dot(model.y, alpha)
        relres = info.residual_norm / jnp.linalg.norm(model.y)

        def mvw(vv):
            return M_inv_sqrt(mv(M_inv_sqrt(vv)))

        ld_white = slq_logdet(
            mvw, n, key=key, num_probes=8, lanczos_iters=48,
            dtype=jnp.float32, layout="bm",
        )
        return (quad_cl, ld_cl, quad_it, info.iterations, relres, defect,
                ld_M, ld_white)

    pp, pc = explicit_closure(
        pieces,
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.ShapeDtypeStruct(jax.random.PRNGKey(0).shape, jax.random.PRNGKey(0).dtype),
    )
    t0 = time.time()
    out = jax.jit(pp)(pc, params, jax.random.PRNGKey(0))
    quad_cl, ld_cl, quad_it, iters, relres, defect, ld_M, ld_white = map(np.asarray, out)
    print(f"wall {time.time()-t0:.1f}s", flush=True)
    print(f"quad closed {float(quad_cl):.1f}  iter {float(quad_it):.1f} "
          f"(gap {float(quad_it-quad_cl):.1f})")
    print(f"CG iters {int(iters)}  rel resid {float(relres[0]):.3e}  "
          f"U orth defect {float(defect):.2e}")
    ld_it = float(ld_M) + float(ld_white)
    print(f"ld closed {float(ld_cl):.1f}  iter {ld_it:.1f} (= ld_M {float(ld_M):.1f} "
          f"+ white {float(ld_white):.1f}; gap {ld_it-float(ld_cl):.1f})")


if __name__ == "__main__":
    main()
