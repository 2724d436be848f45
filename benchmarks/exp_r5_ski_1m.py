"""Round-5 session: SKI scale point at n=1M / 32^4 lattice (m=1.05M).

10x the BASELINE config-2 data size, same lattice.  Uses the segmented
solver API (log_likelihood_segmented: host-segmented CG + probe-chunked
whitened SLQ, staying under the axon ~60 s watchdog) on the LATTICE-DUAL
solver (solver="lattice"): at n=1M the data-space operator diverges f32 CG
at every deflation rank (exp_r5b_precond_1m.py), while the whitened dual's
spectrum clusters around local-density ratios.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r5_ski_1m.py [rank ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
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

    ranks = [int(a) for a in sys.argv[1:]] or [512]
    for r in ranks:
        t0 = time.time()
        m = GPSKIRegression(
            x, y, make_kernel("rbf", lengthscale=0.8), xg,
            noise_var=0.1, num_probes=8, lanczos_iters=30,
            cg_iters=400, cg_tol=1e-6, precond_rank=r, solver="lattice",
        )
        print(f"r={r}: model+plan build {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        ll = m.log_likelihood_segmented(
            cg_segment_iters=50, probe_chunk=4, verbose=True
        )
        t_cold = time.time() - t0
        t0 = time.time()
        ll2 = m.log_likelihood_segmented(cg_segment_iters=50, probe_chunk=4)
        t_warm = time.time() - t0
        print(
            f"r={r}: nlml={-ll:.2f} (repeat {-ll2:.2f}) cold={t_cold:.1f}s "
            f"warm={t_warm:.1f}s", flush=True,
        )

        # Prediction at scale: 2k test points, mean via the lattice-dual
        # alpha (predict's variance path is exercised at 100k scales; the
        # monolithic per-chunk variance programs still closure-capture the
        # plan tables, which is fine at ~350MB but not worth the relay
        # lowering time in this experiment).
        t0 = time.time()
        xs = rng.uniform(0.2, 3.8, size=(2000, d)).astype("float32")
        mu = m.predict(xs, compute_var=False)
        f_true = (np.sin(xs[:, 0]) * np.cos(xs[:, 1]) + 0.3 * xs[:, 2]
                  - 0.2 * xs[:, 3] ** 2)
        rmse = float(np.sqrt(np.mean((mu - f_true) ** 2)))
        print(f"r={r}: predict 2k pts (mean) {time.time()-t0:.1f}s rmse={rmse:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
