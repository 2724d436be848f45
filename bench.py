"""Headline benchmark: Kronecker matvec effective bandwidth (BASELINE.json:2).

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

The Kron matvec is the reference's hot primitive (SURVEY.md §3.4) and the
north-star target is ≥70% of HBM bandwidth (BASELINE.json:5).  ``vs_baseline``
is measured against that target on the *local* chip: a stream kernel measures
achievable HBM bandwidth (speed-of-light proxy) and
``vs_baseline = kron_GBs / (0.70 × stream_GBs)`` — ≥1.0 means the target is
met on whatever chip the driver runs.

Timing methodology: the remote-tunneled TPU backend (axon) does not
synchronize on ``block_until_ready``, so each measurement chains ``ITERS``
dependent applications of the op inside one jitted ``lax.fori_loop`` and
fetches a scalar — one host round-trip per measurement, real device time.
"""

import json
import time

import numpy as np

ITERS = 50


def _timed_loop(step, init, iters=ITERS, warmup=1):
    """Per-iteration wall time via the slope between two chained-loop lengths
    (cancels fixed dispatch/tunnel overhead)."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(v):
            # optimization_barrier stops XLA from unrolling+fusing trivial
            # bodies across iterations (observed: a bare saxpy chain collapsed
            # into one pass, reporting 1.5 TB/s "stream").
            def body(i, vv):
                return jax.lax.optimization_barrier(step(vv))

            v = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(v[:8])  # tiny fetch forces execution

        return run

    short, long = make(10), make(10 + iters)

    def best_of(run, reps=3):
        _ = float(run(init))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(init))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((best_of(long) - best_of(short)) / iters, 1e-9)


def main(d: int = 5, m_d: int = 32, iters: int = ITERS):
    from gp_grief_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gp_grief_tpu.ops import kron_matvec_fast as kron_matvec

    dtype = jnp.float32
    # Default shape is bandwidth-bound: d=5 dims of 32 → m = 33.5M (134 MB
    # vectors f32) — the matvec streams from HBM.
    m = m_d**d
    rng = np.random.default_rng(0)
    # Normalize factors to ~unit spectral radius so 50 chained matvecs stay finite.
    factors = tuple(
        jnp.asarray(
            rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), dtype=dtype
        )
        for _ in range(d)
    )
    v = jnp.asarray(rng.standard_normal((m,)), dtype=dtype)

    # Production hot-loop operating point: Precision.DEFAULT is what the
    # refined-CG inner loop runs (ops/cg.py:cg_solve_refined — bf16 matvecs,
    # exact residual refreshes restore full solution accuracy; NLML-level
    # study in benchmarks/RESULTS_r2.md).  On TPU this dispatches to the
    # 2-pass rotation-free Pallas slab schedule (rel err ~2e-3 vs exact).
    t_mv = _timed_loop(
        lambda vv: kron_matvec(factors, vv, precision=jax.lax.Precision.DEFAULT),
        v,
        iters=iters,
    )
    # Algorithmic traffic: each of the d passes reads and writes the lattice
    # once (factor matrices are negligible).
    kron_gbs = 2 * d * m * v.dtype.itemsize / t_mv / 1e9

    # X3-grade point (rel err ~4e-6): the 3-pass slab at Mosaic HIGHEST.
    from gp_grief_tpu.ops.pallas.kron_pallas import (
        kron_matvec_slab,
        slab_schedule_applicable,
    )

    x3_gbs = None
    if jax.default_backend() == "tpu" and slab_schedule_applicable(factors, 1):
        t_x3 = _timed_loop(
            lambda vv: kron_matvec_slab(
                factors, vv, precision=jax.lax.Precision.HIGHEST
            ),
            v,
            iters=iters,
        )
        x3_gbs = 2 * d * m * v.dtype.itemsize / t_x3 / 1e9

    # Stream speed-of-light proxy: y = 2y + 1 reads m + writes m per iter.
    x = jnp.asarray(rng.standard_normal((m,)), dtype=dtype)
    t_st = _timed_loop(lambda vv: 2.0 * vv + 1.0, x, iters=iters)
    stream_gbs = 2 * m * x.dtype.itemsize / t_st / 1e9

    target = 0.70 * stream_gbs
    print(
        json.dumps(
            {
                "metric": "kron_matvec_bandwidth",
                "value": round(kron_gbs, 2),
                "unit": "GB/s",
                "vs_baseline": round(kron_gbs / target, 4),
                "detail": {
                    "shape": f"(kron {d}x{m_d}^2)·v, m={m}",
                    "dtype": "float32 data, Precision.DEFAULT (refined-CG hot-loop"
                    " operating point: bf16 MXU dots, rel err ~2e-3; exact outer"
                    " refreshes give exact-grade solutions — RESULTS_r2.md)",
                    "matvec_ms": round(t_mv * 1e3, 3),
                    "x3_grade_GBs(rel~4e-6)": None if x3_gbs is None else round(x3_gbs, 2),
                    "stream_GBs": round(stream_gbs, 2),
                    "target_GBs(0.7xstream)": round(target, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
