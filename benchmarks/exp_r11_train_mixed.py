"""End-to-end optimize_segmented at 1M/32^4: train_mixed16 vs f32 step solves.

Follows up exp_r11_bf16_dual.py (per-iteration: 4.16 -> 3.39 ms/iter): does
the bf16 training-solve path move the full Adam step (solves + surrogate
value_and_grad + host update), and do the loss trajectories agree?

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r11_train_mixed.py [n]
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
    d, ms = 4, 32
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    y = (
        np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
        + 0.5 * x[:, 2] * x[:, 3]
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)
    xg = [np.linspace(-0.05, 1.05, ms, dtype=np.float32)[:, None]] * d
    t0 = time.time()
    m = GPSKIRegression(
        x, y, [make_kernel("rbf", lengthscale=0.3) for _ in range(d)], xg,
        noise_var=0.05, solver="lattice", num_probes=8, lanczos_iters=30,
        cg_iters=300, cg_tol=1e-6,
    )
    print(f"model build {time.time() - t0:.1f} s", flush=True)

    for mixed in (False, True):
        m._train_mixed16 = mixed
        p0 = m.params
        t0 = time.time()
        res = m.optimize_segmented(
            max_iters=8, learning_rate=0.05, num_probes=8, verbose=True
        )
        wall = time.time() - t0
        # steady-state step = mean of the last 5 (first steps pay compile)
        print(
            f"mixed16={mixed}: total {wall:.1f} s for 8 steps, "
            f"losses {np.array2string(res.losses, precision=4)}",
            flush=True,
        )
        m.params = p0  # same start for the second variant


if __name__ == "__main__":
    main()
