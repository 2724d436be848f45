"""Diagnose the dual solve's 8% data-space residual at n=1M (exp_r5d).

Candidates: (a) recurrence/true-residual decoupling on the whitened lattice
system, (b) f32 cancellation in the data-space mapping α = (y − WM⁻½γ)/σ².
Measures both, then tests one step of data-space iterative refinement
through the dual.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5e_dual_quad.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression
from gp_grief_tpu.ops.cg import cg_solve_segmented
from gp_grief_tpu.ops.interp import interp_matvec_bm_fast
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.utils.closure import explicit_closure


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(0)
    d, md = 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))

    m = GPSKIRegression(
        x, y, make_kernel("rbf", lengthscale=0.8), xg,
        noise_var=0.1, cg_iters=400, cg_tol=1e-8, solver="lattice",
    )

    def prep(params):
        sigma2 = jnp.exp(params["log_noise"])
        factors = cov_grid(params["kernels"], m.xg, dim_noise_var=0.0)
        Qs, wjs, ld_MK = m._lattice_spectra(factors, sigma2)
        return factors, sigma2, Qs, wjs

    pp, pc = explicit_closure(
        prep, jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), m.params)
    )
    factors, sigma2, Qs, wjs = jax.jit(pp)(pc, m.params)
    msqrt, white = m._make_lattice_ops(Qs, wjs)

    def data_op(al_bm):  # Â in data space
        u = kron_matvec_fast(factors, m._rmatvec_bm(al_bm)[0])
        return interp_matvec_bm_fast(m._plan, u[None, :]) + sigma2 * al_bm

    def dual_solve(r_bm):  # B^{-1}-correction path: (r − WM⁻½γ)/σ², γ = W̃⁻¹M⁻½Wᵀr
        vt = msqrt(m._rmatvec_bm(r_bm))
        gam = cg_solve_segmented(
            white, vt, tol=1e-9, segment_iters=30, max_segments=6, layout="bm",
        )
        return (r_bm - interp_matvec_bm_fast(m._plan, msqrt(gam))) / sigma2, gam, vt

    # --- pass 1 -------------------------------------------------------------
    t0 = time.time()
    alpha, gam, vt = dual_solve(y[None, :])
    print(f"pass1 {time.time()-t0:.1f}s", flush=True)

    def probes(gam, vt, alpha):
        wres = jnp.linalg.norm(white(gam) - vt) / jnp.linalg.norm(vt)
        Aal = data_op(alpha)
        dres = jnp.linalg.norm(Aal[0] - y) / jnp.linalg.norm(y)
        corr = interp_matvec_bm_fast(m._plan, msqrt(gam))[0]
        return (wres, dres, jnp.linalg.norm(corr), jnp.linalg.norm(y),
                sigma2 * jnp.linalg.norm(alpha[0]),
                jnp.dot(y, alpha[0]),
                jnp.dot(vt[0], gam[0]), jnp.dot(y.astype(jnp.float32), y))

    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)  # noqa: E731
    qp, qc = explicit_closure(probes, sds(gam), sds(vt), sds(alpha))
    wres, dres, ncorr, ny, nsa, quad_a, vtg, yy = jax.jit(qp)(qc, gam, vt, alpha)
    print(f"TRUE whitened resid {float(wres):.3e} | TRUE data resid {float(dres):.3e}",
          flush=True)
    print(f"cancellation: |WMg|={float(ncorr):.4e} |y|={float(ny):.4e} "
          f"|s2*alpha|={float(nsa):.4e}", flush=True)
    print(f"quad via y.alpha={float(quad_a):.2f}  via dual (yy-vt.g)/s2="
          f"{(float(yy) - float(vtg)) / float(sigma2):.2f}", flush=True)

    # --- one data-space refinement pass ------------------------------------
    def resid_fn(al_bm):
        return y[None, :] - data_op(al_bm)

    rp, rc = explicit_closure(resid_fn, sds(alpha))
    r1 = jax.jit(rp)(rc, alpha)
    d_alpha, _, _ = dual_solve(r1)

    def upd(alpha, d_alpha):
        a2 = alpha + d_alpha
        dres2 = jnp.linalg.norm(data_op(a2)[0] - y) / jnp.linalg.norm(y)
        return a2, dres2, jnp.dot(y, a2[0])

    up, uc = explicit_closure(upd, sds(alpha), sds(d_alpha))
    alpha2, dres2, quad2 = jax.jit(up)(uc, alpha, d_alpha)
    print(f"after 1 refinement: TRUE data resid {float(dres2):.3e} "
          f"quad={float(quad2):.2f}", flush=True)


if __name__ == "__main__":
    main()
