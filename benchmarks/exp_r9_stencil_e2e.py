"""1M/32⁴ lattice-dual operating point with the WᵀW stencil (vs windowed).

Measures on the real TPU: segmented NLML (fused probes) and one
optimize_segmented training step, with wtw_stencil True vs False.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r9_stencil_e2e.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression


def run(stencil: bool, x, y, xg, d):
    t0 = time.time()
    m = GPSKIRegression(
        x, y, [make_kernel("rbf", lengthscale=0.3) for _ in range(d)], xg,
        noise_var=0.05, solver="lattice", num_probes=8, lanczos_iters=30,
        cg_iters=300, cg_tol=1e-6, wtw_stencil=stencil,
    )
    if stencil:
        assert m._wtw_stencil is not None
    t_ctor = time.time() - t0
    t0 = time.time()
    v = m.log_likelihood_segmented(probe_chunk=8, fuse_probes=True, verbose=True)
    t_cold = time.time() - t0
    t0 = time.time()
    v2 = m.log_likelihood_segmented(probe_chunk=8, fuse_probes=True)
    t_warm = time.time() - t0
    print(
        f"stencil={stencil}: NLML {v:.4f} (repeat {v2:.4f}) "
        f"ctor+plans {t_ctor:.1f} s cold {t_cold:.1f} s warm {t_warm:.1f} s",
        flush=True,
    )
    # one training step, then per-step time over a few steps
    t0 = time.time()
    m.optimize_segmented(max_iters=1, learning_rate=0.05, num_probes=4)
    t_step1 = time.time() - t0
    t0 = time.time()
    m.optimize_segmented(max_iters=3, learning_rate=0.05, num_probes=4, verbose=True)
    t_steps = (time.time() - t0) / 3
    print(
        f"stencil={stencil}: train step cold {t_step1:.1f} s, warm "
        f"{t_steps:.2f} s/step", flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d, mbar = 4, 32
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    y = (
        np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
        + 0.5 * x[:, 2] * x[:, 3]
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)
    xg = [np.linspace(0, 1, mbar).astype(np.float32) for _ in range(d)]
    for stencil in (True, False):
        run(stencil, x, y, xg, d)


if __name__ == "__main__":
    main()
