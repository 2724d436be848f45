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

WEATHER-PROOFING (round-5; rounds 2 and 4 both lost the official driver
artifact to transient relay/backend failures while the code was healthy —
rc=124 timeout and a TPU ABORTED respectively):

- Each phase (``matvec``, ``stream``, ``x3``) runs in its OWN fresh
  subprocess: a dead/aborted TPU backend poisons the process it died in, so
  isolation is the only way a retry can succeed.
- Each phase attempt is bounded by its own wall timeout (``BENCH_PHASE_
  TIMEOUT``, ``BENCH_X3_TIMEOUT``) — the X3 attempt is no longer gated on
  the *headline's* past weather (the round-4 elapsed-budget test), its own
  attempt is simply bounded.
- Each phase retries ONCE after a failure or timeout (the persistent
  compilation cache makes the retry cheap when the first attempt died of
  weather after compiling).
- The final JSON line is ALWAYS printed, with honest ``"failed(...)"`` /
  ``"skipped(...)"`` markers for any phase that produced no number.

Crash-injection hook for the test suite: ``BENCH_FAKE_ABORT=<phase>`` makes
that phase's FIRST attempt raise a fake ABORTED error; the retry must
succeed and the headline JSON must still be emitted (rc=0).

Runtime budget notes (history): the loop length is a *traced argument*, so
each op costs ONE compiled program; inputs are generated ON DEVICE (a 134 MB
relay upload measured 4.6-65 s of weather); reps are 1 warm + 3 timed per
loop length.  Phases share the persistent compilation cache, so the
subprocess split costs only backend init (~seconds), not recompiles.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ITERS = 25
STREAM_REF_GBS = 728.5  # best stream ever captured on this chip class (r03)

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Phase bodies (run inside the per-phase subprocess)
# --------------------------------------------------------------------------


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


def _phase_setup(d: int, m_d: int):
    """Shared phase prologue: backend, cache, on-device input, factors."""
    from gp_grief_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_FORCE_CPU") == "1":
        # Test-suite hook: the axon sitecustomize overrides JAX_PLATFORMS,
        # so CPU must be pinned via the config API after import.
        jax.config.update("jax_platforms", "cpu")

    dtype = jnp.float32
    m = m_d**d
    rng = np.random.default_rng(0)
    # Normalize factors to ~unit spectral radius so chained matvecs stay finite.
    factors = tuple(
        jnp.asarray(
            rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), dtype=dtype
        )
        for _ in range(d)
    )
    # Generate the test vector ON DEVICE (relay upload weather, see header).
    v = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), dtype))()
    v.block_until_ready()
    _log(f"device={jax.devices()[0]}, m={m}, input generated on device")
    return jax, factors, v, m


def _maybe_fake_abort(phase: str) -> None:
    if (
        os.environ.get("BENCH_FAKE_ABORT") == phase
        and os.environ.get("BENCH_ATTEMPT", "0") == "0"
    ):
        raise RuntimeError(
            "ABORTED: TPU backend error (fake injected crash for the "
            "bench weather-proofing test)"
        )


def run_phase(phase: str, d: int, m_d: int, iters: int = ITERS) -> dict:
    """Execute one measurement phase; returns its result dict.

    ``matvec``: production hot-loop operating point — Precision.DEFAULT is
    what the refined-CG inner loop runs (ops/cg.py:cg_solve_refined — bf16
    MXU dots, rel err ~4e-3; exact outer refreshes give exact-grade
    solutions, verified to 6e-8 true residual, RESULTS_r13.md).  On TPU this
    dispatches to the 2-pass rotation-free Pallas slab schedule.

    ``stream``: y = 2y + 1 speed-of-light proxy (reads m + writes m per
    iteration).  The stream body is ~9× cheaper per iteration than the
    matvec, so the slope uses a longer chain for the same
    signal-to-relay-jitter ratio.

    ``x3``: exact-grade extra point (rel err ~4e-6) — the 2-pass fused-mid
    slab at Mosaic HIGHEST.
    """
    _maybe_fake_abort(phase)
    jax, factors, v, m = _phase_setup(d, m_d)
    bytes_mv = 2 * len(factors) * m * v.dtype.itemsize

    if phase == "matvec":
        from gp_grief_tpu.ops import kron_matvec_fast as kron_matvec

        t = _timed_loop(
            lambda vv: kron_matvec(factors, vv, precision=jax.lax.Precision.DEFAULT),
            v,
            iters=2 * iters,
        )
        gbs = bytes_mv / t / 1e9
        _log(f"kron matvec: {t * 1e3:.3f} ms → {gbs:.1f} GB/s eff")
        return {"ok": True, "gbs": gbs, "ms": t * 1e3}

    if phase == "stream":
        t = _timed_loop(lambda vv: 2.0 * vv + 1.0, v, iters=4 * iters)
        gbs = 2 * m * v.dtype.itemsize / t / 1e9
        _log(f"stream: {t * 1e3:.3f} ms → {gbs:.1f} GB/s")
        return {"ok": True, "gbs": gbs, "ms": t * 1e3}

    if phase == "x3":
        from gp_grief_tpu.ops.pallas.kron_pallas import (
            kron_matvec_slab,
            slab_schedule_applicable,
        )

        if jax.default_backend() != "tpu":
            return {"ok": False, "skip": f"skipped(backend={jax.default_backend()})"}
        if not slab_schedule_applicable(factors, 1):
            return {"ok": False, "skip": "skipped(shape: slab not applicable)"}
        t = _timed_loop(
            lambda vv: kron_matvec_slab(
                factors, vv, precision=jax.lax.Precision.HIGHEST
            ),
            v,
            iters=2 * iters,
        )
        gbs = bytes_mv / t / 1e9
        _log(f"x3-grade slab: {t * 1e3:.3f} ms → {gbs:.1f} GB/s eff")
        return {"ok": True, "gbs": gbs, "ms": t * 1e3}

    raise ValueError(f"unknown phase {phase!r}")


# --------------------------------------------------------------------------
# Orchestrator (parent process)
# --------------------------------------------------------------------------


def _launch_phase(phase: str, d: int, m_d: int, timeout: float) -> dict:
    """Run one phase in a fresh subprocess with ONE retry.

    A transient backend ABORT kills the process it happened in (the backend
    object is poisoned), so each attempt gets a brand-new interpreter; the
    persistent compilation cache keeps the retry cheap.  Returns the phase's
    result dict, or ``{"ok": False, "skip"/"fail": reason}``.
    """
    for attempt in range(2):
        env = dict(os.environ, BENCH_ATTEMPT=str(attempt))
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--phase",
                    phase,
                    "--d",
                    str(d),
                    "--m_d",
                    str(m_d),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            _log(f"phase {phase} attempt {attempt}: TIMEOUT after {timeout:.0f}s")
            if attempt == 0:
                continue
            return {"ok": False, "fail": f"failed(timeout {timeout:.0f}s x2)"}
        dt = time.perf_counter() - t0
        if proc.returncode == 0:
            try:
                out = json.loads(proc.stdout.decode().strip().splitlines()[-1])
                _log(f"phase {phase} attempt {attempt}: ok in {dt:.1f}s")
                return out
            except (ValueError, IndexError):
                _log(f"phase {phase} attempt {attempt}: unparseable output")
        else:
            _log(
                f"phase {phase} attempt {attempt}: rc={proc.returncode} "
                f"after {dt:.1f}s"
            )
        if attempt == 1:
            return {"ok": False, "fail": f"failed(rc={proc.returncode} x2)"}
        _log(f"phase {phase}: retrying once in a fresh subprocess")
    return {"ok": False, "fail": "failed(unreachable)"}


def main(d: int = 5, m_d: int = 32, iters: int = ITERS):
    phase_timeout = float(os.environ.get("BENCH_PHASE_TIMEOUT", "900"))
    x3_timeout = float(os.environ.get("BENCH_X3_TIMEOUT", "300"))
    want_x3 = os.environ.get("BENCH_X3", "") != "0"

    m = m_d**d
    res_mv = _launch_phase("matvec", d, m_d, phase_timeout)
    res_st = _launch_phase("stream", d, m_d, phase_timeout)
    res_x3 = (
        _launch_phase("x3", d, m_d, x3_timeout)
        if want_x3
        else {"ok": False, "skip": "skipped(BENCH_X3=0)"}
    )

    kron_gbs = res_mv.get("gbs") if res_mv.get("ok") else None
    stream_gbs = res_st.get("gbs") if res_st.get("ok") else None
    x3_val = (
        round(res_x3["gbs"], 2)
        if res_x3.get("ok")
        else res_x3.get("skip", res_x3.get("fail", "failed(?)"))
    )

    # vs_baseline denominator: the stream's measured value inherits ±10%
    # run-to-run relay/HBM weather, which round-over-round made the ratio
    # incomparable (round-3 weak #6).  Clamp the denominator to the best
    # stream ever captured on this chip class so a weather-LOW (or missing)
    # stream can never inflate the ratio; a faster future chip raises it.
    stream_ref = max(stream_gbs or 0.0, STREAM_REF_GBS)
    target = 0.70 * stream_ref
    value = round(kron_gbs, 2) if kron_gbs is not None else 0.0
    vs = round((kron_gbs or 0.0) / target, 4)

    print(
        json.dumps(
            {
                "metric": "kron_matvec_bandwidth",
                "value": value,
                "unit": "GB/s",
                "vs_baseline": vs,
                "detail": {
                    "shape": f"(kron {d}x{m_d}^2)·v, m={m}",
                    "dtype": "float32 data, Precision.DEFAULT (refined-CG hot-loop"
                    " operating point: bf16 MXU dots, rel err ~4e-3; exact outer"
                    " refreshes give exact-grade solutions — refined-CG verified"
                    " to 6e-8 true residual at this grade, RESULTS_r13.md)",
                    "matvec_ms": (
                        round(res_mv["ms"], 3)
                        if res_mv.get("ok")
                        else res_mv.get("fail", "failed(?)")
                    ),
                    "x3_grade_GBs(rel~4e-6)": x3_val,
                    "stream_GBs": (
                        round(stream_gbs, 2)
                        if stream_gbs is not None
                        else res_st.get("fail", "failed(?)")
                    ),
                    "target_GBs(0.7xstream_ref)": round(target, 2),
                    "stream_ref_GBs": round(stream_ref, 2),
                    "phases": "subprocess-isolated, 1 retry each "
                    f"(timeouts {phase_timeout:.0f}s/{x3_timeout:.0f}s)",
                },
            }
        ),
        flush=True,
    )
    _log("headline JSON printed")
    return 0


def _parse_args(argv):
    args = {"phase": None, "d": 5, "m_d": 32}
    it = iter(argv)
    for a in it:
        if a == "--phase":
            args["phase"] = next(it)
        elif a == "--d":
            args["d"] = int(next(it))
        elif a == "--m_d":
            args["m_d"] = int(next(it))
    return args


if __name__ == "__main__":
    a = _parse_args(sys.argv[1:])
    if a["phase"] is not None:
        out = run_phase(a["phase"], a["d"], a["m_d"])
        print(json.dumps(out), flush=True)
        sys.exit(0)
    sys.exit(main(d=a["d"], m_d=a["m_d"]))
