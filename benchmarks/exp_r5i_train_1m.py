"""Segmented TRAINING at n=1M / 32^4 (optimize_segmented demonstration).

10 Adam steps on the lattice-dual solver, each step = segmented solves
(bounded programs) + one bounded surrogate-gradient program.  Records
per-step wall time and the true NLML before/after
(log_likelihood_segmented).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5i_train_1m.py
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
    rng = np.random.default_rng(0)
    n, d, md = 1_000_000, 4, 32
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1]) + 0.3 * x[:, 2] - 0.2 * x[:, 3] ** 2
         + 0.1 * rng.standard_normal(n)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))

    t0 = time.time()
    m = GPSKIRegression(
        x, y, make_kernel("rbf", lengthscale=1.3), xg,
        noise_var=0.3, num_probes=8, lanczos_iters=30,
        cg_iters=300, cg_tol=1e-6, solver="lattice",
    )
    print(f"build {time.time()-t0:.0f}s", flush=True)
    ll0 = m.log_likelihood_segmented(cg_segment_iters=50, probe_chunk=4)
    print(f"ll before: {ll0:.1f}", flush=True)
    t0 = time.time()
    res = m.optimize_segmented(
        max_iters=10, learning_rate=0.1, num_probes=4,
        cg_segment_iters=50, verbose=True,
    )
    print(f"10 steps in {time.time()-t0:.0f}s "
          f"({(time.time()-t0)/10:.1f}s/step)", flush=True)
    ll1 = m.log_likelihood_segmented(cg_segment_iters=50, probe_chunk=4)
    import jax.numpy as jnp
    print(f"ll after: {ll1:.1f} (improve {ll1-ll0:+.1f}); "
          f"sigma2 {float(jnp.exp(m.params['log_noise'])):.4f}", flush=True)


if __name__ == "__main__":
    main()
