"""Round-5: device-time breakdown of kin40k-scale GRIEF training (VERDICT r4
weak #5 / next #8).

The kin40k config trains 350 Adam steps in ~49-64 s — compile/dispatch-bound
per the r14 note ("measured, no easy win").  This script PROVES (or refutes)
that with data: the per-step device time is isolated as the slope between
warm single-chunk programs of 50 and 100 steps (dispatch cancels), and the
per-chunk dispatch overhead follows by subtraction.  If dispatch dominates,
`fit(scan_chunk=...)` (round-5 knob) amortizes it.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r15_kin40k_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

import gp_grief_tpu as gpx


def build_model():
    rng = np.random.default_rng(0)
    n, d = 40000, 8
    x = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    f = (np.sin(3 * x[:, 0] * x[:, 1]) + x[:, 2] * np.cos(2 * x[:, 3])
         + np.sin(x[:, 4] + 2 * x[:, 5]) * x[:, 6] + 0.5 * x[:, 7] ** 2)
    y = (f + 0.05 * rng.standard_normal(n)).astype(np.float32)
    xtr, ytr = x[:30000], y[:30000]
    grid = gpx.InducingGrid.build(xtr, mbar=16)
    kerns = [gpx.make_kernel("rbf", lengthscale=0.7) for _ in range(d)]
    return gpx.GPGriefModel(
        xtr, ytr, kerns, grid, n_eigs=400, noise_var=0.1, dtype=np.float32,
        opt_kernel_params=True, dim_noise_var=1e-6,
    )


def timed_opt(model, iters, chunk):
    t0 = time.perf_counter()
    model.optimize(optimizer="adam", max_iters=iters, learning_rate=0.03,
                   scan_chunk=chunk, tol=0.0)
    return time.perf_counter() - t0


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    model = build_model()
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)

    # Compile each chunk-length program once (costs are one-time; the
    # persistent cache carries them across runs).
    for chunk in (25, 50, 100):
        t = timed_opt(model, chunk, chunk)
        print(f"[cold chunk={chunk}] {t:.2f}s", flush=True)

    # Warm single-chunk measurements (best of 2).
    warm = {}
    for chunk in (25, 50, 100):
        warm[chunk] = min(timed_opt(model, chunk, chunk) for _ in range(2))
        print(f"[warm chunk={chunk}] {warm[chunk]:.3f}s "
              f"({warm[chunk]/chunk*1e3:.1f} ms/step)", flush=True)

    dev_per_step = (warm[100] - warm[50]) / 50.0
    disp = warm[50] - 50 * dev_per_step
    print(f"device/step ≈ {dev_per_step*1e3:.1f} ms; "
          f"dispatch+host per chunk ≈ {disp*1e3:.0f} ms "
          f"({disp/warm[25]*100:.0f}% of a warm 25-chunk)", flush=True)

    # Full ARD-phase equivalents: 150 steps at chunk 25 (the old default)
    # vs chunk 100 (hot programs in both cases).
    t_150_25 = timed_opt(model, 150, 25)
    t_150_100 = timed_opt(model, 150, 100)
    print(f"[150 steps] chunk=25: {t_150_25:.2f}s   chunk=100: {t_150_100:.2f}s "
          f"({t_150_25/t_150_100:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
