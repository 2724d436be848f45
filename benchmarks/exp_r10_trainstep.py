"""Dissect the segmented train step at 1M/32⁴: where does the time go?

The r9 e2e run showed the stencil arm's NLML 5× faster but its TRAIN step
2× slower (16.6 vs 8.5 s/step) — this times init/seg/fin/vg separately.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r10_trainstep.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression


def run(stencil: bool, x, y, xg, d):
    m = GPSKIRegression(
        x, y, [make_kernel("rbf", lengthscale=0.3) for _ in range(d)], xg,
        noise_var=0.05, solver="lattice", num_probes=8, lanczos_iters=30,
        cg_iters=300, cg_tol=1e-6, wtw_stencil=stencil,
    )
    R, seg_iters = 4, 50
    progs = m._build_step_programs(R, seg_iters)
    (init_fn, init_c), (seg_fn, seg_c), (fin_fn, fin_c) = progs
    key = jax.random.fold_in(m._key, 1000)

    def t(label, fn, reps=3):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0]) if out is not None else None
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            # scalar fetch forces through the relay
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        print(f"  stencil={stencil} {label}: {best*1e3:.1f} ms", flush=True)
        return out

    aux, state, bnorm, rnorm, z = init_fn(init_c, m.params, key)
    t("init_fn", lambda: init_fn(init_c, m.params, key))
    out = t("seg_fn (50 iters)", lambda: seg_fn(seg_c, aux, state))
    t("fin_fn", lambda: fin_fn(fin_c, aux, out[0]))

    # the surrogate value_and_grad exactly as optimize_segmented builds it
    from gp_grief_tpu.utils.closure import explicit_closure

    sol = fin_fn(fin_c, aux, out[0])
    n = int(m.x.shape[0])
    M = int(np.prod([int(g.shape[0]) for g in m.xg]))
    from gp_grief_tpu.kernels.grid import cov_grid

    def surrogate(params, sol, z):
        sigma2 = jnp.exp(params["log_noise"])
        factors = cov_grid(params["kernels"], m.xg, dim_noise_var=m.dim_noise_var)
        yy = jnp.dot(m.y, m.y)
        Qs, wjs, ld_MK = m._lattice_spectra(factors, sigma2)
        to_dual, _, white = m._make_lattice_ops(Qs, wjs)
        vt = to_dual(m._rmatvec_bm(m.y[None, :]))
        gam, S = sol[0], sol[1:]
        quad = (yy - 2.0 * jnp.dot(vt[0], gam)
                + jnp.dot(gam, white(gam[None, :])[0])) / sigma2
        g_sur = jnp.sum(S * white(z)) / R
        ld_part = (n - M) * params["log_noise"] + ld_MK + g_sur
        return 0.5 * (quad + ld_part + n * jnp.log(2.0 * jnp.pi))

    sds = lambda tr: jax.tree.map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tr
    )
    sur_pure, sur_consts = explicit_closure(surrogate, sds(m.params), sds(sol), sds(z))
    vg = jax.jit(lambda c, p, s, zz: jax.value_and_grad(
        lambda pp: sur_pure(c, pp, s, zz))(p))
    t0 = time.perf_counter()
    _ = jax.tree.leaves(vg(sur_consts, m.params, sol, z))[0].block_until_ready()
    print(f"  stencil={stencil} vg cold: {time.perf_counter()-t0:.1f} s", flush=True)
    t("vg warm", lambda: vg(sur_consts, m.params, sol, z))

    # full step path for cross-check
    t0 = time.perf_counter()
    solz = m._segmented_step_solves(m.params, key, R, seg_iters)
    _ = np.asarray(solz[0][0, :1])
    print(f"  stencil={stencil} _segmented_step_solves total: "
          f"{time.perf_counter()-t0:.1f} s", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d, mbar = 4, 32
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1]) + 0.5 * x[:, 2] * x[:, 3]
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    xg = [np.linspace(0, 1, mbar).astype(np.float32) for _ in range(d)]
    for stencil in (True, False):
        run(stencil, x, y, xg, d)


if __name__ == "__main__":
    main()
