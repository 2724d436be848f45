"""Validate the lattice-dual NLML pieces at n=1M (exp_r5c follow-up).

The 100k cross-check showed the dual's log-det is *quadrature-biased* at
n ≪ M (the assembly subtracts ~2e6-scale terms; k=30 Gauss nodes over a
5-decade whitened spectrum leave ~1e5 bias — solver="data" is the right
tool there).  At n=1M ≈ M the whitened spectrum should be tight; this
script quantifies it:

1. TRUE data-space residual of the dual solve ``α`` (conditioning-free
   correctness check of the quad term).
2. ld_white at k ∈ {30, 60, 120} × R ∈ {8, 16} — quadrature/probe
   convergence of the log-det term.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5d_dual_validation.py [n]
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
from gp_grief_tpu.ops.lanczos import slq_logdet_segmented
from gp_grief_tpu.utils.closure import explicit_closure


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(0)
    d, md = 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md**d

    m = GPSKIRegression(
        x, y, make_kernel("rbf", lengthscale=0.8), xg,
        noise_var=0.1, cg_iters=400, cg_tol=1e-8, solver="lattice",
    )

    def prep(params):
        sigma2 = jnp.exp(params["log_noise"])
        factors = cov_grid(params["kernels"], m.xg, dim_noise_var=0.0)
        Qs, wjs, ld_MK = m._lattice_spectra(factors, sigma2)
        return factors, sigma2, Qs, wjs, ld_MK

    pp, pc = explicit_closure(
        prep, jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), m.params)
    )
    factors, sigma2, Qs, wjs, ld_MK = jax.jit(pp)(pc, m.params)
    msqrt, white = m._make_lattice_ops(Qs, wjs)
    print(f"n={n}: ld_MK={float(ld_MK):.1f} (n-M)logs2={(n-M)*float(jnp.log(sigma2)):.1f}",
          flush=True)

    # --- 1. dual solve + TRUE data-space residual -------------------------
    def rhs_fn():
        return msqrt(m._rmatvec_bm(y[None, :]))

    rp, rc = explicit_closure(rhs_fn)
    vt = jax.jit(rp)(rc)
    t0 = time.time()
    gam = cg_solve_segmented(
        white, vt, tol=1e-8, segment_iters=25, max_segments=16,
        layout="bm", verbose=True,
    )
    print(f"dual solve {time.time()-t0:.1f}s", flush=True)

    def resid_fn(g_bm):
        # alpha = (y - W msqrt(gam)) / s2 in data space; true residual of
        # (W K Wt + s2 I) alpha = y  via the DATA-space operator.
        corr = m._matvec_bm  # not used; build data-space pieces directly
        from gp_grief_tpu.ops.interp import interp_matvec_bm_fast
        from gp_grief_tpu.ops.kron_fast import kron_matvec_fast

        alpha = (y[None, :] - interp_matvec_bm_fast(m._plan, msqrt(g_bm))) / sigma2
        u = m._rmatvec_bm(alpha)
        u = kron_matvec_fast(factors, u[0])
        Aal = interp_matvec_bm_fast(m._plan, u[None, :]) + sigma2 * alpha
        num = jnp.linalg.norm(Aal[0] - y)
        den = jnp.linalg.norm(y)
        quad = jnp.dot(y, alpha[0])
        return num / den, quad

    fp, fc = explicit_closure(resid_fn, jax.ShapeDtypeStruct(gam.shape, gam.dtype))
    rel, quad = jax.jit(fp)(fc, gam)
    print(f"TRUE data-space rel resid = {float(rel):.3e}  quad(y'A^-1 y)={float(quad):.2f}",
          flush=True)

    # --- 2. SLQ depth/probe sweep on the whitened operator ----------------
    for k in (30, 60, 120):
        for R in (8, 16):
            t0 = time.time()
            ld = slq_logdet_segmented(
                white, M, key=jax.random.PRNGKey(1), num_probes=R,
                lanczos_iters=k, dtype=jnp.float32, layout="bm",
                probe_chunk=2 if k >= 120 else 4,
            )
            print(f"ld_white k={k} R={R}: {ld:.1f}  ({time.time()-t0:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
