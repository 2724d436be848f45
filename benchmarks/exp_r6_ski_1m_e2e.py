"""End-to-end effect of the windowed interpolation applies at n=1M / 32⁴.

Before (RESULTS_r5 §8): whitened apply ~300 ms at B=4 (flat ELL + fused
corner gathers from >VMEM sources at ~0.65 G elem/s); warm segmented NLML
40.8 s.  The windowed plan (ops/interp_windowed.py) measured 2.6×/2.3× on
the isolated Wᵀ/W shapes (exp_r6_windowed_gather.py) — this script measures
the shipped dispatch end-to-end.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_ski_1m_e2e.py [n] [B]
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
from gp_grief_tpu.utils.closure import explicit_closure


def timed(fn, x, iters=20):
    def make(nloops):
        def run(v):
            def body(i, vv):
                return jax.lax.optimization_barrier(fn(vv))

            v = jax.lax.fori_loop(0, nloops, body, v)
            return jnp.sum(v.reshape(-1)[:8])

        pure, consts = explicit_closure(run, jax.ShapeDtypeStruct(x.shape, x.dtype))
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
    # Same data model as exp_r5_ski_1m.py so the NLML is comparable to the
    # r5 reference (ll = 176096.7): smooth signal + 0.1 noise.  (A pure-noise
    # y legitimately gives quad ≈ yᵀy/σ² ≈ 1e7 and ll ≈ −4.8M — the first
    # run of this script mistook that for a correctness bug.)
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md**d

    t0 = time.time()
    # num_probes/lanczos_iters match exp_r5_ski_1m.py so warm NLML wall
    # times are comparable to the r5 reference (40.8 s).
    m = GPSKIRegression(
        x, y, make_kernel("rbf", lengthscale=0.8), xg,
        noise_var=0.1, solver="lattice", num_probes=8, lanczos_iters=30,
    )
    kind = (
        "onehot" if m._wt_onehot is not None
        else ("windowed" if m._w_ops is not None else "flat-ELL")
    )
    extra = ""
    if m._wplan is not None:
        p = m._wplan
        extra = f" Wr={p.Wr} Wc={p.Wc} T={p.T} Tp={p.Tp} ov={int(p.ov_ids.shape[0])}"
    print(f"build {time.time()-t0:.0f}s  dispatch: {kind}{extra}", flush=True)

    factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=0.0)
    sigma2 = jnp.asarray(0.1, jnp.float32)
    Qs, wjs, _ = jax.jit(lambda: m._lattice_spectra(factors, sigma2))()
    msqrt, white = m._make_lattice_ops(Qs, wjs)

    v_lat = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))

    if m._w_ops is not None:
        mv_s, rmv_s = m._w_ops
        t = timed(lambda v: rmv_s(mv_s(v)), v_lat)
        print(f"wtw windowed-sorted (B={B}): {t*1e3:.1f} ms", flush=True)
    t = timed(msqrt, v_lat)
    print(f"msqrt (B={B}): {t*1e3:.1f} ms", flush=True)
    t = timed(white, v_lat)
    print(f"whitened apply (B={B}): {t*1e3:.1f} ms", flush=True)

    t0 = time.time()
    ll = m.log_likelihood_segmented(cg_segment_iters=50, probe_chunk=2, verbose=True)
    t_cold = time.time() - t0
    t0 = time.time()
    ll2 = m.log_likelihood_segmented(cg_segment_iters=50, probe_chunk=2)
    t_warm = time.time() - t0
    print(f"segmented NLML: {ll:.1f} (cold {t_cold:.1f}s, warm {t_warm:.1f}s; "
          f"repeat {ll2:.1f})", flush=True)


if __name__ == "__main__":
    main()
