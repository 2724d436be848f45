"""Round-3: end-to-end SKI NLML wall time after the scatter-free interp.

Times one jitted NLML execution (CG + SLQ) at n=100k, m=32^4=1.05M for both
cg_precision modes, plus their NLML agreement.  Compare against the
pre-plan baseline (exact scatter everywhere): 41.6 s exec per NLML at
cg_iters=300/k=40 probes=8 (RESULTS_r2.md §7 watchdog analysis).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_ski_e2e.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression


def main():
    rng = np.random.default_rng(0)
    n, d, md = 100_000, 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))

    vals = {}
    modes = sys.argv[1:] or ["exact", "mixed"]
    for mode in modes:
        m = GPSKIRegression(
            x, y, make_kernel("rbf", lengthscale=0.8), xg,
            noise_var=0.1, num_probes=8, lanczos_iters=30,
            cg_iters=300, cg_precision=mode,
        )
        f = jax.jit(m._loss)
        t0 = time.time()
        v0 = float(f(m.params))
        t_cold = time.time() - t0
        t0 = time.time()
        v1 = float(f(m.params))
        t_warm = time.time() - t0
        vals[mode] = v1
        print(f"{mode:6s} nlml={v1:.4f}  cold={t_cold:.1f}s warm={t_warm:.2f}s",
              flush=True)
    if len(vals) == 2:
        gap = abs(vals["mixed"] - vals["exact"]) / abs(vals["exact"])
        print(f"mixed-vs-exact NLML gap: {gap:.2e}", flush=True)


if __name__ == "__main__":
    main()
