"""Driver-contract smoke tests: bench.py emits one valid JSON line; the
__graft_entry__ hooks compile and run on the test mesh."""

import io
import json
import os
import sys
from contextlib import redirect_stdout

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_bench_subprocess(extra_env, args=("--d", "3", "--m_d", "4")):
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        BENCH_FORCE_CPU="1",
        BENCH_PHASE_TIMEOUT="120",
        BENCH_X3_TIMEOUT="60",
        **extra_env,
    )
    env.pop("BENCH_X3", None)
    return subprocess.run(
        [sys.executable, os.path.join(root, "bench.py"), *args],
        env=env,
        capture_output=True,
        timeout=420,
    )


def _headline_record(proc):
    lines = [l for l in proc.stdout.decode().strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    return json.loads(lines[0])


def test_bench_emits_valid_json_line():
    proc = _run_bench_subprocess({})
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = _headline_record(proc)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["metric"] == "kron_matvec_bandwidth"
    assert np.isfinite(rec["value"]) and rec["value"] > 0


def test_bench_survives_injected_backend_abort():
    """Rounds 2 and 4 lost the official driver BENCH artifact to transient
    relay/backend failures (rc=124 timeout; TPU ABORTED) while the code was
    healthy.  bench.py now runs each phase in a fresh subprocess with one
    retry — an ABORTED first attempt must NOT cost the headline JSON."""
    proc = _run_bench_subprocess({"BENCH_FAKE_ABORT": "matvec"})
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = _headline_record(proc)
    assert np.isfinite(rec["value"]) and rec["value"] > 0
    err = proc.stderr.decode()
    assert "retrying once in a fresh subprocess" in err
    # Phase isolation markers present and honest: stream untouched by the
    # injected matvec crash.
    assert isinstance(rec["detail"]["stream_GBs"], float)


def test_bench_phase_failure_is_bounded_and_honest():
    """Full-failure path: a phase that dies on BOTH attempts must come back
    as an honest failed(...) marker (never an exception) so the headline
    JSON still assembles."""
    import bench

    res = bench._launch_phase("nonexistent-phase", 2, 4, timeout=60)
    assert res["ok"] is False and "failed" in res.get("fail", "")


def test_bench_phase_program_budget(monkeypatch):
    """The round-2 driver BENCH capture timed out (rc=124) because bench.py
    compiled 6 programs and uploaded ~400 MB through the relay.  Guard the
    fix at the phase level: each phase may jit at most 2 programs (device-
    side input generation + the timed loop) and must never host-stage a
    data-sized array (the relay upload was 4.6-65 s of wall weather)."""
    import jax

    import bench

    real_jit = jax.jit
    for phase in ("matvec", "stream"):
        jitted = []

        def counting_jit(fn, *a, **kw):
            jitted.append(getattr(fn, "__name__", "<lambda>"))
            return real_jit(fn, *a, **kw)

        monkeypatch.setattr(jax, "jit", counting_jit)
        res = bench.run_phase(phase, 3, 4)
        monkeypatch.setattr(jax, "jit", real_jit)
        assert res["ok"], res
        assert len(jitted) <= 2, (phase, jitted)


def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    ge.dryrun_multichip(2)  # 1-D data mesh on the 8 virtual devices


@pytest.mark.slow
def test_dryrun_multichip_driver_exact():
    """The driver's EXACT invocation — ``dryrun_multichip(8)`` in a fresh
    subprocess with NO inherited virtual-device flags (this is what crashed in
    round 1: the entry must self-configure the 8-device backend)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Scrub anything the conftest set up; the entry must do it itself.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr}\nstdout:\n{r.stdout}"
    assert "dryrun_multichip OK" in r.stdout
    assert "'data': 4" in r.stdout and "'model': 2" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_subprocess_fallback():
    """When jax is ALREADY initialized with too few devices, the entry must
    fall back to a fresh subprocess (the axon-driver scenario: one real TPU)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "  # backend up, 1 device
        "import __graft_entry__ as ge; ge.dryrun_multichip(4)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr}\nstdout:\n{r.stdout}"
    assert "dryrun_multichip OK" in r.stdout


@pytest.mark.slow
def test_cli_checkgrad_smoke():
    """``python -m gp_grief_tpu checkgrad`` (SURVEY §5: the reference's
    checkgrad parity table kept as a CLI subcommand) exits 0 and prints OK."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "gp_grief_tpu", "checkgrad"],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr}\nstdout:\n{r.stdout}"
    assert "checkgrad table" in r.stdout and "OK" in r.stdout
