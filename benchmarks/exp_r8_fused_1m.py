"""1M/32⁴ operating point after the CornerStream + fused-probe rounds.

Measures on the real TPU: (1) model construction + lazy plan build (host),
(2) cold + warm segmented NLML with fuse_probes=True vs False.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r8_fused_1m.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression


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

    t0 = time.time()
    m = GPSKIRegression(
        x, y, [make_kernel("rbf", lengthscale=0.3) for _ in range(d)], xg,
        noise_var=0.05, solver="lattice", num_probes=8, lanczos_iters=30,
        cg_iters=300, cg_tol=1e-6,
    )
    t_ctor = time.time() - t0
    t0 = time.time()
    m._w_ops  # touch: builds cstream + windowed plan (the n >= m lazy path)
    t_plans = time.time() - t0
    print(f"ctor {t_ctor:.1f} s, lazy plan build {t_plans:.1f} s")

    for fuse in (True, False):
        t0 = time.time()
        v = m.log_likelihood_segmented(probe_chunk=8, fuse_probes=fuse, verbose=True)
        t_cold = time.time() - t0
        t0 = time.time()
        v2 = m.log_likelihood_segmented(probe_chunk=8, fuse_probes=fuse)
        t_warm = time.time() - t0
        print(
            f"fuse={fuse}: NLML {v:.3f} (repeat {v2:.3f}) "
            f"cold {t_cold:.1f} s warm {t_warm:.1f} s"
        )


if __name__ == "__main__":
    main()
