"""Diagnose the rank-r deflation preconditioner at n=1M (exp_r5 follow-up).

At n=100k, r=512 converges CG in 69 iters (RESULTS_r4 §6).  At n=1M the
first segmented solve DIVERGED (rel resid 8.4 after 50 iters, all columns
frozen by the breakdown guard) — the SPD-loss signature.  Sweep rank and
probe the preconditioner itself: symmetry/SPD of M⁻¹ on random vectors and
per-segment residuals.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5b_precond_1m.py [n] [rank ...]
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
from gp_grief_tpu.ops.precond import lowrank_sqrt_ops
from gp_grief_tpu.utils.closure import explicit_closure


def main():
    args = [int(a) for a in sys.argv[1:]]
    n = args[0] if args else 1_000_000
    ranks = args[1:] or [512, 256, 128]
    rng = np.random.default_rng(0)
    d, md = 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))

    for r in ranks:
        m = GPSKIRegression(
            x, y, make_kernel("rbf", lengthscale=0.8), xg,
            noise_var=0.1, cg_iters=300, cg_tol=1e-6, precond_rank=r,
        )
        factors_sds = None

        def prep(params):
            sigma2 = jnp.exp(params["log_noise"])
            factors = cov_grid(params["kernels"], m.xg, dim_noise_var=0.0)
            if r > 0:
                U, lam = m._precond_spectral(factors, r)
            else:
                U, lam = None, None
            return factors, sigma2, U, lam

        pp, pc = explicit_closure(
            prep, jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), m.params)
        )
        t0 = time.time()
        factors, sigma2, U, lam = jax.jit(pp)(pc, m.params)
        if U is not None:
            # Orthonormality defect of the CholeskyQR2+eigh basis — THE
            # SPD-loss driver (measure before anything else).
            def defect(U):
                G = jnp.matmul(U.T, U, precision=jax.lax.Precision.HIGHEST)
                return jnp.max(jnp.abs(G - jnp.eye(G.shape[0], dtype=G.dtype)))

            dp, dc = explicit_closure(defect, jax.ShapeDtypeStruct(U.shape, U.dtype))
            dmax = float(jax.jit(dp)(dc, U))
            lam_h = np.asarray(lam)
            print(f"r={r}: prep {time.time()-t0:.1f}s  orth defect {dmax:.2e}  "
                  f"lam[max,min] {lam_h.max():.3e},{lam_h.min():.3e}", flush=True)
            M_inv, M_inv_sqrt, ldM = lowrank_sqrt_ops(U, lam, sigma2, layout="bm")
            # SPD probe of M_inv: v M⁻¹ v must be > 0 and symmetric.
            v = jnp.asarray(rng.standard_normal((2, n)).astype("float32"))

            def spd(v):
                z = M_inv(v)
                return jnp.sum(v * z, axis=1), jnp.sum(v[0] * M_inv(v[1:2])[0]) - jnp.sum(v[1] * M_inv(v[0:1])[0])

            sp, sc = explicit_closure(spd, jax.ShapeDtypeStruct(v.shape, v.dtype))
            q, asym = jax.jit(sp)(sc, v)
            print(f"r={r}: vM⁻¹v {np.asarray(q)}  asym {float(asym):.3e}", flush=True)
        else:
            M_inv = None
            print(f"r={r}: prep {time.time()-t0:.1f}s (no precond)", flush=True)

        mv = m._matvec_bm(factors, sigma2)
        # Operator probes (r-independent; run once): CG needs Â symmetric —
        # and the one-hot Wᵀ kernel is untested at this n.  Compare it
        # against the ELL slot-exact form and measure uᵀÂv − vᵀÂu.
        if r == ranks[0]:
            v2 = jnp.asarray(rng.standard_normal((2, n)).astype("float32"))

            def opchk(v2):
                Av = mv(v2)
                asym = jnp.sum(v2[0] * Av[1]) - jnp.sum(v2[1] * Av[0])
                wt_oh = m._rmatvec_bm(v2)
                from gp_grief_tpu.ops.interp import interp_rmatvec_bm_exact

                wt_sl = interp_rmatvec_bm_exact(m._plan, v2)
                rel = jnp.linalg.norm(wt_oh - wt_sl) / jnp.linalg.norm(wt_sl)
                return asym / jnp.sum(jnp.abs(v2[0] * Av[1])), rel

            op, oc = explicit_closure(opchk, jax.ShapeDtypeStruct(v2.shape, v2.dtype))
            asym, relwt = jax.jit(op)(oc, v2)
            print(f"op: rel asym {float(asym):.3e}  onehot-vs-slot Wt rel {float(relwt):.3e}",
                  flush=True)
        t0 = time.time()
        xsol, info = cg_solve_segmented(
            mv, y[None, :].astype("float32"), tol=1e-6, segment_iters=50,
            max_segments=6, M_inv=M_inv, layout="bm", return_info=True,
            verbose=True,
        )
        bn = float(jnp.linalg.norm(y))
        print(f"r={r}: iters={int(info.iterations)} "
              f"rel={float(info.residual_norm[0])/bn:.2e} t={time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
