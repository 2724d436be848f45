"""Round-5 session: SKI scale point at n=1M / 32^4 lattice (m=1.05M).

10x the BASELINE config-2 data size, same lattice.  Splits the NLML into
separately-jitted solve / SLQ programs so each device execution stays under
the axon ~60 s watchdog (CLAUDE.md), and uses the default rank-r deflation
preconditioner (without it f32 CG at this kappa never converges,
RESULTS_r4.md §6).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5_ski_1m.py [rank ...]
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
from gp_grief_tpu.ops.lanczos import slq_logdet


def main():
    rng = np.random.default_rng(0)
    n, d, md = 1_000_000, 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))

    ranks = [int(a) for a in sys.argv[1:]] or [256]
    for r in ranks:
        t0 = time.time()
        m = GPSKIRegression(
            x, y, make_kernel("rbf", lengthscale=0.8), xg,
            noise_var=0.1, num_probes=8, lanczos_iters=30,
            cg_iters=300, cg_tol=1e-6, precond_rank=r,
        )
        print(f"r={r}: model+plan build {time.time()-t0:.1f}s", flush=True)
        factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=0.0)
        sigma2 = jnp.asarray(0.1, jnp.float32)

        # --- CG convergence probe (y + 2 probes) --------------------------
        rhs = jnp.asarray(np.concatenate(
            [y[None, :], rng.standard_normal((2, n)).astype("float32")]))

        def solve_info(rr):
            pre = m._build_precond(factors, sigma2)
            mv = m._matvec_bm(factors, sigma2)
            return cg_solve(
                mv, rr, tol=1e-6, max_iters=300,
                M_inv=pre[0] if pre is not None else None,
                layout="bm", implicit_diff=False, return_info=True)

        t0 = time.time()
        xsol, info = jax.jit(solve_info)(rhs)
        iters = int(info.iterations)
        t_cold = time.time() - t0
        bn = float(jnp.linalg.norm(rhs[0]))
        print(f"r={r}: cg iters={iters} rel_resid(y)="
              f"{float(info.residual_norm[0])/bn:.2e} cold={t_cold:.1f}s",
              flush=True)
        t0 = time.time()
        jax.jit(solve_info)(rhs)[1].iterations.block_until_ready()
        print(f"r={r}: solve warm={time.time()-t0:.2f}s", flush=True)

        # --- SLQ logdet alone (whitened) ----------------------------------
        def slq_only(key):
            pre = m._build_precond(factors, sigma2)
            mv = m._matvec_bm(factors, sigma2)
            M_inv_sqrt, ld_off = pre[1], pre[2]
            wmv = lambda vv: M_inv_sqrt(mv(M_inv_sqrt(vv)))  # noqa: E731
            return ld_off + slq_logdet(
                wmv, n, key=key, num_probes=8, lanczos_iters=30,
                dtype=jnp.float32, layout="bm")

        t0 = time.time()
        ld = float(jax.jit(slq_only)(jax.random.PRNGKey(1)))
        print(f"r={r}: slq logdet={ld:.1f} cold={time.time()-t0:.1f}s",
              flush=True)

        # --- full NLML -----------------------------------------------------
        f = jax.jit(m._loss)
        t0 = time.time(); v0 = float(f(m.params)); t_cold = time.time() - t0
        t0 = time.time(); v1 = float(f(m.params)); t_warm = time.time() - t0
        print(f"r={r}: nlml={v1:.2f} cold={t_cold:.1f}s warm={t_warm:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
