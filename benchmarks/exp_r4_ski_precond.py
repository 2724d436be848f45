"""Round-4: deflation-preconditioned SKI NLML at the BASELINE config-2 shape.

Motivation (RESULTS_r4.md §6): the unpreconditioned n=100k / RBF ls=0.8 /
32⁴ / σ²=0.1 operator has κ ≳ 1/ε_f32 — 300 CG iterations leave the
quadratic-form estimate off by ~10⁶ and the NLML moves wildly under any
rounding change.  The rank-r Kronecker-eigen deflation + whitened SLQ
(models/gp_ski.py:_build_precond) is the fix; this measures NLML value,
CG convergence, and warm wall per rank.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r4_ski_precond.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression
from gp_grief_tpu.ops.cg import cg_solve


def main():
    rng = np.random.default_rng(0)
    n, d, md = 100_000, 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    rhs = jnp.asarray(np.concatenate(
        [y[None, :], rng.standard_normal((2, n)).astype("float32")]))

    ranks = [int(a) for a in sys.argv[1:]] or [256, 512]
    for r in ranks:
        m = GPSKIRegression(
            x, y, make_kernel("rbf", lengthscale=0.8), xg,
            noise_var=0.1, num_probes=8, lanczos_iters=30,
            cg_iters=300, cg_tol=1e-6, precond_rank=r,
        )
        factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=0.0)
        sigma2 = jnp.asarray(0.1, jnp.float32)

        def solve_info(rr, m=m, factors=factors, sigma2=sigma2):
            pre = m._build_precond(factors, sigma2)
            mv = m._matvec_bm(factors, sigma2)
            return cg_solve(
                mv, rr, tol=1e-6, max_iters=300,
                M_inv=pre[0] if pre is not None else None,
                layout="bm", implicit_diff=False, return_info=True)

        xsol, info = jax.jit(solve_info)(rhs)
        bn = float(jnp.linalg.norm(rhs[0]))
        print(f"r={r}: cg iters={int(info.iterations)} "
              f"rel_resid(y)={float(info.residual_norm[0])/bn:.2e}", flush=True)

        f = jax.jit(m._loss)
        t0 = time.time(); v0 = float(f(m.params)); t_cold = time.time() - t0
        t0 = time.time(); v1 = float(f(m.params)); t_warm = time.time() - t0
        print(f"r={r}: nlml={v1:.2f} cold={t_cold:.1f}s warm={t_warm:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
