"""r14: end-to-end fused-matvec benefit on a 2-D SKI lattice-dual model.

A 2-D spatial problem with a 1024x1024 lattice (M=1.05M): the dual's
eigenbasis transforms are (I_B, Q0, Q1) matvecs — exactly the wide-factor
d=2 class where kron_matvec_fused measured 4.75x the cyclic chain
(exp_r14_general.py).  Times the warm segmented NLML and one training step
with the fused dispatch ON vs gated OFF (same estimator, same draws).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import gp_grief_tpu as gpx
from gp_grief_tpu.models.gp_ski import GPSKIRegression
from gp_grief_tpu.ops.pallas import kron_pallas


def build():
    rng = np.random.default_rng(0)
    n = 500_000
    x = rng.uniform(0, 3, size=(n, 2)).astype(np.float32)
    y = (
        np.sin(2 * x[:, 0]) * np.cos(1.5 * x[:, 1])
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    xg = [np.linspace(-0.01, 3.01, 1024)[:, None].astype(np.float32)] * 2
    return GPSKIRegression(
        x, y, gpx.make_kernel("rbf", lengthscale=0.25), xg,
        solver="lattice", noise_var=0.05, num_probes=8, lanczos_iters=30,
        cg_iters=200, cg_tol=1e-6,
    )


def run(tag):
    m = build()
    t0 = time.perf_counter()
    ll = m.log_likelihood_segmented(cg_segment_iters=40, probe_chunk=4)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ll2 = m.log_likelihood_segmented(cg_segment_iters=40, probe_chunk=4)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = m.optimize_segmented(max_iters=3, learning_rate=0.05, num_probes=4,
                               cg_segment_iters=40)
    t_step = (time.perf_counter() - t0) / 3
    print(
        f"[{tag}] nlml={ll:.2f} (repeat {ll2:.2f})  "
        f"cold={t_cold:.1f}s warm={t_warm:.2f}s  step={t_step:.2f}s/it",
        flush=True,
    )
    return ll, t_warm, t_step


def main():
    ll_f, warm_f, step_f = run("fused ON")
    orig = kron_pallas.fused_schedule_applicable
    kron_pallas.fused_schedule_applicable = lambda *a, **k: False
    try:
        ll_x, warm_x, step_x = run("fused OFF (cyclic)")
    finally:
        kron_pallas.fused_schedule_applicable = orig
    print(
        f"warm NLML: {warm_x:.2f}s -> {warm_f:.2f}s ({warm_x / warm_f:.2f}x)  "
        f"step: {step_x:.2f} -> {step_f:.2f} ({step_x / step_f:.2f}x)  "
        f"|dll|={abs(ll_f - ll_x):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
