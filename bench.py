"""Headline benchmark: Kronecker matvec effective bandwidth (BASELINE.json:2).

Prints ONE JSON line to stdout: ``{"metric", "value", "unit", "vs_baseline"}``.
Progress/diagnostics go to stderr so a driver timeout tail shows the phase.

The Kron matvec is the reference's hot primitive (SURVEY.md §3.4) and the
north-star target is ≥70% of HBM bandwidth (BASELINE.json:5).  ``vs_baseline``
is measured against that target on the *local* chip: a stream kernel measures
achievable HBM bandwidth (speed-of-light proxy) and
``vs_baseline = kron_GBs / (0.70 × stream_GBs)`` — ≥1.0 means the target is
met on whatever chip the driver runs.

Timing methodology: the remote-tunneled TPU backend (axon) does not
synchronize on ``block_until_ready``, so each measurement chains dependent
applications of the op inside one jitted loop and fetches a scalar — one host
round-trip per measurement; per-iteration time is the slope between two
chained-loop lengths (cancels fixed dispatch/tunnel overhead).

Runtime budget (the round-2 driver capture timed out at rc=124 with a warm
compile cache): the loop length is a *traced argument*, so each op costs ONE
compiled program (round 2 used two per op); the stream phase reuses the
matvec's device-resident input (one 134 MB relay upload total, round 2
shipped three); reps are 1 warm + 3 timed per loop length (each run costs
only milliseconds of device time — compile is the wall-clock cost).  The
X3-grade extra point runs by DEFAULT behind a wall-budget guard: it is
skipped (marked ``"skipped(wall budget)"``) only if the headline phases
already consumed ``BENCH_X3_BUDGET`` seconds (default 90 — a cleared
compile cache plus relay weather); with the persistent cache warm it costs
a few seconds.  ``BENCH_X3=0`` forces it off, ``BENCH_X3=1`` ignores the
budget.
"""

import json
import os
import sys
import time

import numpy as np

ITERS = 25


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _timed_loop(step, init, iters=ITERS, reps=3):
    """Per-iteration wall time via the slope between two chained-loop lengths
    (cancels fixed dispatch/tunnel overhead).  The loop length is a traced
    scalar argument so short and long runs share ONE compiled program."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, n):
        # optimization_barrier stops XLA from unrolling+fusing trivial
        # bodies across iterations (observed: a bare saxpy chain collapsed
        # into one pass, reporting 1.5 TB/s "stream").
        def body(i, vv):
            return jax.lax.optimization_barrier(step(vv))

        v = jax.lax.fori_loop(0, n, body, v, unroll=False)
        return jnp.sum(v[:8])  # tiny fetch forces execution

    short_n, long_n = 5, 5 + iters
    _ = float(run(init, long_n))  # compile + warm (relay paths, cache)

    def best_of(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(init, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_long, t_short = best_of(long_n), best_of(short_n)
    return max((t_long - t_short) / iters, 1e-9)


def main(d: int = 5, m_d: int = 32, iters: int = ITERS, x3: bool | None = None):
    from gp_grief_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gp_grief_tpu.ops import kron_matvec_fast as kron_matvec

    if x3 is None:
        env = os.environ.get("BENCH_X3", "")
        x3 = True if env == "1" else (False if env == "0" else None)

    dtype = jnp.float32
    # Default shape is bandwidth-bound: d=5 dims of 32 → m = 33.5M (134 MB
    # vectors f32) — the matvec streams from HBM.
    m = m_d**d
    rng = np.random.default_rng(0)
    # Normalize factors to ~unit spectral radius so chained matvecs stay finite.
    factors = tuple(
        jnp.asarray(
            rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), dtype=dtype
        )
        for _ in range(d)
    )
    # Generate the 134 MB test vector ON DEVICE: uploading it through the
    # axon relay measured 4.6-65 s (throughput weather); a jitted normal()
    # costs milliseconds and removes the variance from the driver's window.
    v = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), dtype)
    )()
    v.block_until_ready()
    _log(f"device={jax.devices()[0]}, m={m}, input generated on device")

    # Production hot-loop operating point: Precision.DEFAULT is what the
    # refined-CG inner loop runs (ops/cg.py:cg_solve_refined — bf16 matvecs,
    # exact residual refreshes restore full solution accuracy; NLML-level
    # study in benchmarks/RESULTS_r2.md).  On TPU this dispatches to the
    # 2-pass rotation-free Pallas slab schedule (rel err ~2e-3 vs exact).
    t_mv = _timed_loop(
        lambda vv: kron_matvec(factors, vv, precision=jax.lax.Precision.DEFAULT),
        v,
        iters=2 * iters,
    )
    # Algorithmic traffic: each of the d passes reads and writes the lattice
    # once (factor matrices are negligible).
    kron_gbs = 2 * d * m * v.dtype.itemsize / t_mv / 1e9
    _log(f"kron matvec: {t_mv * 1e3:.3f} ms → {kron_gbs:.1f} GB/s eff")

    # Stream speed-of-light proxy: y = 2y + 1 reads m + writes m per iter.
    # Reuses the matvec's device-resident buffer — no second relay upload.
    # The stream body is ~9× cheaper per iteration than the matvec, so the
    # slope needs a longer chain for the same signal-to-relay-jitter ratio
    # (measured: ±5-10 ms per-call jitter vs a 10 ms signal at 25 iters gave
    # a >spec 1068 GB/s artifact).  Device time stays trivial (~40 ms).
    t_st = _timed_loop(lambda vv: 2.0 * vv + 1.0, v, iters=4 * iters)
    stream_gbs = 2 * m * v.dtype.itemsize / t_st / 1e9
    _log(f"stream: {t_st * 1e3:.3f} ms → {stream_gbs:.1f} GB/s")

    # X3-grade extra point (rel err ~4e-6): the 2-pass fused-mid slab at
    # Mosaic HIGHEST.  Runs by default (round-3 missing #5: the exact-grade
    # number must be driver-visible) behind a wall-budget guard — skipped
    # only if the headline phases already burned the budget (cleared compile
    # cache + relay weather); the persistent cache makes the usual cost a
    # few seconds.
    x3_budget = float(os.environ.get("BENCH_X3_BUDGET", "90"))
    elapsed = time.perf_counter() - _T0
    if x3 is None:
        x3 = elapsed < x3_budget
        x3_skip_reason = f"skipped(wall budget: +{elapsed:.0f}s > {x3_budget:.0f}s)"
    else:
        x3_skip_reason = "skipped(BENCH_X3=0)"
    x3_gbs = None if x3 else x3_skip_reason
    if x3:
        from gp_grief_tpu.ops.pallas.kron_pallas import (
            kron_matvec_slab,
            slab_schedule_applicable,
        )

        if jax.default_backend() == "tpu" and slab_schedule_applicable(factors, 1):
            t_x3 = _timed_loop(
                lambda vv: kron_matvec_slab(
                    factors, vv, precision=jax.lax.Precision.HIGHEST
                ),
                v,
                iters=2 * iters,
            )
            x3_gbs = 2 * d * m * v.dtype.itemsize / t_x3 / 1e9
            _log(f"x3-grade slab: {t_x3 * 1e3:.3f} ms → {x3_gbs:.1f} GB/s eff")

    # vs_baseline denominator: the stream's measured value inherits ±10%
    # run-to-run relay/HBM weather, which round-over-round made the ratio
    # incomparable (round-3 weak #6: 644.8/728 one run, 674/660 another).
    # Clamp the denominator to the best stream ever captured on this chip
    # class (728.5 GB/s, BENCH_r03) so a weather-LOW stream can never
    # inflate the ratio; a faster future chip honestly raises it.
    stream_ref = max(stream_gbs, 728.5)
    target = 0.70 * stream_ref
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
                    " operating point: bf16 MXU dots, rel err ~4e-3; exact outer"
                    " refreshes give exact-grade solutions — refined-CG verified"
                    " to 6e-8 true residual at this grade, RESULTS_r13.md)",
                    "matvec_ms": round(t_mv * 1e3, 3),
                    "x3_grade_GBs(rel~4e-6)": (
                        round(x3_gbs, 2) if isinstance(x3_gbs, float) else x3_gbs
                    ),
                    "stream_GBs": round(stream_gbs, 2),
                    "target_GBs(0.7xstream_ref)": round(target, 2),
                    "stream_ref_GBs": round(stream_ref, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )
    _log("headline JSON printed")


if __name__ == "__main__":
    main()
