"""Round-5: d=100 ARD step ON THE CHIP (VERDICT r4 weak #6 / next #7).

The round-4 batched basis (`kernels/grief.py: stack_kernels`) cut the d=100
ARD step from ~33 s to 1.27 s warm — but only measured on one CPU core.
This script runs the demo_grief_highdim configuration (n=2000, d=100, p=200,
mbar=10, opt_kernel_params=True) on the real TPU and records:

1. warm per-step time for phi_impl="batched" (the stack_kernels einsum path)
   and "auto" (which on-chip dispatches the fused Pallas Φ assembly),
   isolated as the slope between warm chunked programs (dispatch cancels);
2. a full 25-step ARD phase + 150-step reweight polish wall time — the
   demo's two-phase recipe end-to-end on the chip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r15_d100_tpu.py
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


def build_model(phi_impl):
    rng = np.random.default_rng(0)
    n, d = 2000, 100
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    y = (np.sin(4 * x[:, 0]) + 0.7 * np.cos(3 * x[:, 1]) + 0.3 * x[:, 2]
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    grid = gpx.InducingGrid.build(x, mbar=10)
    kerns = [gpx.make_kernel("rbf", lengthscale=1.5) for _ in range(d)]
    model = gpx.GPGriefModel(
        x, y, kerns, grid, n_eigs=200, noise_var=0.1, dtype=np.float32,
        opt_kernel_params=True, dim_noise_var=1e-8,
    )
    model.phi_impl = phi_impl  # class attr (models/gp_grief.py:113)
    return model, x, y


def timed_opt(model, iters, chunk):
    t0 = time.perf_counter()
    model.optimize(optimizer="adam", max_iters=iters, learning_rate=0.05,
                   scan_chunk=chunk, tol=0.0)
    return time.perf_counter() - t0


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    for impl in ("batched", "auto"):
        t0 = time.perf_counter()
        model, _, _ = build_model(impl)
        ll0 = float(model.log_likelihood())
        print(f"[{impl}] build+first NLML: {time.perf_counter()-t0:.1f}s  "
              f"ll={ll0:.2f}", flush=True)

        for chunk in (5, 10, 20):
            t = timed_opt(model, chunk, chunk)
            print(f"[{impl}] cold chunk={chunk}: {t:.2f}s", flush=True)
        warm = {}
        for chunk in (10, 20):
            warm[chunk] = min(timed_opt(model, chunk, chunk) for _ in range(2))
            print(f"[{impl}] warm chunk={chunk}: {warm[chunk]:.3f}s "
                  f"({warm[chunk]/chunk*1e3:.0f} ms/step)", flush=True)
        dev = (warm[20] - warm[10]) / 10.0
        print(f"[{impl}] ARD device/step ≈ {dev*1e3:.0f} ms "
              f"(CPU-warm r14 reference: 1270 ms)", flush=True)

    # Full two-phase demo recipe on the chip with the default impl.
    model, x, y = build_model("auto")
    t0 = time.perf_counter()
    model.optimize(optimizer="adam", max_iters=25, learning_rate=0.05, tol=0.0)
    t_ard = time.perf_counter() - t0
    model.opt_kernel_params = False
    model.refresh_basis()
    t0 = time.perf_counter()
    model.optimize(optimizer="adam", max_iters=150, learning_rate=0.05, tol=0.0)
    t_pol = time.perf_counter() - t0
    import jax.numpy as jnp
    ls = sorted((float(jnp.exp(k.log_lengthscale)), i)
                for i, k in enumerate(model.params["kernels"]))
    top = [i for _, i in ls[:5]]
    print(f"[e2e] ARD 25 steps {t_ard:.1f}s + polish 150 steps {t_pol:.1f}s; "
          f"relevant dims {top} (truth: 0,1,2)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
