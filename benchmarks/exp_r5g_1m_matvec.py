"""Per-component timing of the whitened dual matvec at n=1M (exp_r5 follow-up).

Warm segmented NLML is ~78 s for ~110 whitened matvecs (~0.7 s each) while
the gather/DMA roofline says ~60 ms.  Times each piece separately: Wᵀ via
the one-hot kernel vs the ELL slot form, the forward W gather, msqrt (4 Kron
passes), and the composed whitened apply.  Chained-loop slope timing
(bench.py methodology — block_until_ready does not sync through the relay).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5g_1m_matvec.py [n] [B]
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
from gp_grief_tpu.ops.interp import (
    interp_matvec_bm_fast,
    interp_rmatvec_bm_exact,
)
from gp_grief_tpu.utils.closure import explicit_closure


def timed(fn, x, iters=20):
    import jax

    def make(n):
        def run(v):
            def body(i, vv):
                return jax.lax.optimization_barrier(fn(vv))

            v = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(v.reshape(-1)[:8])

        pure, consts = explicit_closure(
            run, jax.ShapeDtypeStruct(x.shape, x.dtype)
        )
        return jax.jit(pure), consts

    short, long = make(3), make(3 + iters)

    def best(jc, reps=2):
        f, c = jc
        _ = float(f(c, x))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f(c, x))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(long) - best(short)) / iters, 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    d, md = 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = rng.standard_normal(n).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md**d

    t0 = time.time()
    m = GPSKIRegression(
        x, y, make_kernel("rbf", lengthscale=0.8), xg,
        noise_var=0.1, solver="lattice",
    )
    print(f"build {time.time()-t0:.0f}s  onehot plan: "
          f"{'YES' if m._wt_onehot is not None else 'None (slot)'}  "
          f"ELL K={int(m._plan.slot_src.shape[1])} "
          f"ov={int(m._plan.ov_ids.shape[0])}", flush=True)

    factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=0.0)
    sigma2 = jnp.asarray(0.1, jnp.float32)
    Qs, wjs, _ = jax.jit(lambda: m._lattice_spectra(factors, sigma2))()
    msqrt, white = m._make_lattice_ops(Qs, wjs)

    v_data = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
    v_lat = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))

    # Shape-changing ops are timed as round-trips (chained-loop needs
    # matching carry shapes); the common forward W lets slot/onehot compare.
    t_wslot = timed(lambda v: interp_rmatvec_bm_exact(
        m._plan, interp_matvec_bm_fast(m._plan, v)), v_lat)
    print(f"W then Wt-slot   (B={B}): {t_wslot*1e3:.1f} ms", flush=True)
    if m._wt_onehot is not None:
        t_woh = timed(lambda v: m._wt_onehot(
            interp_matvec_bm_fast(m._plan, v)), v_lat)
        print(f"W then Wt-onehot (B={B}): {t_woh*1e3:.1f} ms", flush=True)
    t_ww = timed(lambda v: interp_matvec_bm_fast(
        m._plan, m._rmatvec_bm(v)), v_data)
    print(f"Wt-dispatch then W (B={B}): {t_ww*1e3:.1f} ms", flush=True)
    t = timed(msqrt, v_lat)
    print(f"msqrt (4 kron passes): {t*1e3:.1f} ms", flush=True)
    # whitened apply needs same-shape in/out for the chained loop: lattice in
    t = timed(white, v_lat)
    print(f"whitened apply: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
