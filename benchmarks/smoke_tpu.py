"""Pinned on-chip smoke/regression suite (round-5, VERDICT r4 next #4).

The TPU-real Pallas paths (slab DEFAULT/X3, general fused win classes,
stencil apply, SKI lattice segmented NLML) were previously exercised only by
ad-hoc ``exp_r*`` scripts and bench.py — the pytest suite runs CPU interpret
mode.  This script measures each pinned point on the real chip and asserts
it inside a WEATHER-TOLERANT band (the relay adds ±10% HBM jitter and
occasional multi-second dispatch stalls; bands are ~2× slack off the
measured operating points, so a regression that halves a path still trips).

Run: ``python benchmarks/smoke_tpu.py``  (<5 min with the persistent
compile cache warm; first-ever run pays ~8 Mosaic/XLA compiles).

Emits ONE JSON line: ``{"ok": bool, "points": {name: {value, unit, band,
pass}}, "wall_s": N}``.  Exit code 0 iff every point passed (or was
explicitly skipped for a non-TPU backend).

Pinned operating points (source of truth for the bands):

| point                       | measured      | band (pass if)    | where |
|-----------------------------|---------------|-------------------|-------|
| slab DEFAULT d=5x32         | ~660-675 GB/s | >= 400 GB/s       | RESULTS_r13 |
| slab X3 (Mosaic HIGHEST)    | ~350-356 GB/s | >= 200 GB/s       | RESULTS_r13 §2 |
| fused (I8, 512^2) DEFAULT   | ~41 us        | <= 200 us         | RESULTS_r14 §1 |
| fused (I8, 512^2) HIGHEST   | ~167 us       | <= 500 us         | RESULTS_r14 §1 |
| stencil WtW apply B=8 32^3  | ~0.1-1 ms     | <= 10 ms          | RESULTS_r9 |
| SKI lattice NLML warm 200k  | ~0.5-2 s      | <= 15 s           | RESULTS_r14 §9 |
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.perf_counter()


def _log(msg):
    print(f"[smoke +{time.perf_counter() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    from gp_grief_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _timed_loop

    points = {}

    def record(name, value, unit, band, ok):
        points[name] = {
            "value": (round(value, 3) if isinstance(value, float) else value),
            "unit": unit,
            "band": band,
            "pass": bool(ok),
        }
        _log(f"{name}: {value if isinstance(value, str) else round(value, 3)} "
             f"{unit} (band {band}) {'PASS' if ok else 'FAIL'}")

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "points": {},
                          "skip": f"backend={jax.default_backend()}"}))
        return 1

    rng = np.random.default_rng(0)
    dtype = jnp.float32

    # ---- slab points (the bench headline pair) --------------------------
    from gp_grief_tpu.ops.pallas.kron_pallas import kron_matvec_slab

    d, m_d = 5, 32
    m = m_d**d
    factors = tuple(
        jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), dtype)
        for _ in range(d)
    )
    v = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), dtype))()
    v.block_until_ready()
    _log(f"device={jax.devices()[0]}; slab input on device")

    t = _timed_loop(
        lambda vv: kron_matvec_slab(
            factors, vv, precision=jax.lax.Precision.DEFAULT,
            mid_dtype=jnp.bfloat16,
        ),
        v, iters=50,
    )
    gbs = 2 * d * m * 4 / t / 1e9
    record("slab_default_GBs", gbs, "GB/s", ">=400", gbs >= 400)

    t = _timed_loop(
        lambda vv: kron_matvec_slab(factors, vv, precision=jax.lax.Precision.HIGHEST),
        v, iters=50,
    )
    gbs = 2 * d * m * 4 / t / 1e9
    record("slab_x3_GBs", gbs, "GB/s", ">=200", gbs >= 200)

    # ---- general fused win class (I_8, 512^2) ---------------------------
    from gp_grief_tpu.ops.kron_fast import kron_matvec_fast

    fs2 = (
        jnp.eye(8, dtype=dtype),
        jnp.asarray(rng.standard_normal((512, 512)) / (2.2 * np.sqrt(512)), dtype),
        jnp.asarray(rng.standard_normal((512, 512)) / (2.2 * np.sqrt(512)), dtype),
    )
    v2 = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (8 * 512 * 512,), dtype)
    )()
    v2.block_until_ready()
    t = _timed_loop(
        lambda vv: kron_matvec_fast(fs2, vv, precision=jax.lax.Precision.DEFAULT),
        v2, iters=100,
    )
    us = t * 1e6
    record("fused_i8_512_default_us", us, "us", "<=200", us <= 200)
    # Round-5 dispatch flip: plain HIGHEST (the solver default) must route
    # onto the fused path here (>=256-wide factor win class) — the cyclic
    # chain measured ~599 us, Mosaic HIGHEST ~167 us.
    t = _timed_loop(
        lambda vv: kron_matvec_fast(fs2, vv, precision=jax.lax.Precision.HIGHEST),
        v2, iters=50,
    )
    us = t * 1e6
    record("fused_i8_512_highest_us", us, "us", "<=500", us <= 500)

    # ---- stencil WtW apply (32^3 lattice, B=8) --------------------------
    from gp_grief_tpu.ops.interp import interp_weights
    from gp_grief_tpu.ops.interp_stencil import (
        build_wtw_stencil,
        make_wtw_stencil_op,
    )

    n_pts = 200_000
    xg3 = [np.linspace(0.0, 1.0, 32)[:, None]] * 3
    x3 = rng.uniform(0.02, 0.98, size=(n_pts, 3))
    iw = interp_weights(jnp.asarray(x3), [jnp.asarray(g) for g in xg3])
    st = build_wtw_stencil(iw)
    op = make_wtw_stencil_op(st)
    M3 = 32**3
    vb = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(2), (8, M3), dtype)
    )()
    vb.block_until_ready()
    t = _timed_loop(lambda vv: op(vv), vb, iters=50)
    ms = t * 1e3
    record("stencil_wtw_b8_32c_ms", ms, "ms", "<=10", ms <= 10)

    # ---- SKI lattice segmented NLML warm (n=200k, 32^3) -----------------
    from gp_grief_tpu import GPSKIRegression, make_kernel

    y3 = np.sin(3 * x3[:, 0]) * np.cos(2 * x3[:, 1]) + 0.1 * x3[:, 2]
    y3 = (y3 + 0.05 * rng.standard_normal(n_pts)).astype(np.float32)
    model = GPSKIRegression(
        x3.astype(np.float32), y3, make_kernel("rbf", lengthscale=0.3),
        xg3, solver="lattice", noise_var=0.05,
    )
    t0 = time.perf_counter()
    ll_cold = model.log_likelihood_segmented()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ll_warm = model.log_likelihood_segmented()
    t_warm = time.perf_counter() - t0
    _log(f"ski nlml cold {t_cold:.1f}s warm {t_warm:.2f}s ll={ll_warm:.4g}")
    ok = t_warm <= 15.0 and np.isfinite(ll_warm)
    record("ski_lattice_nlml_warm_s", t_warm, "s", "<=15", ok)

    wall = round(time.perf_counter() - _T0, 1)
    all_ok = all(p["pass"] for p in points.values())
    print(json.dumps({"ok": all_ok, "points": points, "wall_s": wall}), flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
