"""Round-5: segmented training of the matrix-free exact GP at n=500k.

optimize_segmented decomposes each Adam step into bounded programs
(segmented batched CG + chunked BBMM surrogate-grad sweeps), so training
runs at scales where ONE monolithic value_and_grad program would exceed the
~60 s watchdog (measured edge: n=2^17 at 47 s/step).  This measures 3 steps
at n=500k on the chip + true NLML before/after.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r15_train500k.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

from gp_grief_tpu import GPRegression, make_kernel


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    n = 500_000
    x = rng.uniform(0, 8, size=(n, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) * np.cos(0.7 * x[:, 1])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    m = GPRegression(
        x, y, make_kernel("rbf", lengthscale=0.8, input_dim=2),
        noise_var=0.3, solver="iterative", precond_rank=128,
        num_probes=8, lanczos_iters=24, cg_tol=1e-5, cg_iters=200,
    )
    t0 = time.perf_counter()
    ll0 = m.log_likelihood_iterative_segmented(
        cg_segment_iters=8, slq_iter_segment=6, probe_chunk=8)
    print(f"NLML before: {ll0:.2f}  ({time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    res = m.optimize_segmented(max_iters=3, learning_rate=0.05,
                               cg_segment_iters=8, probe_grad_chunk=4,
                               verbose=True)
    t_fit = time.perf_counter() - t0
    print(f"3 steps: {t_fit:.1f}s total ({t_fit/3:.1f}s/step incl compile); "
          f"data-fit trace {[f'{v:.1f}' for v in res.losses]}", flush=True)
    t0 = time.perf_counter()
    res2 = m.optimize_segmented(max_iters=2, learning_rate=0.05,
                                cg_segment_iters=8, probe_grad_chunk=4)
    t_w = time.perf_counter() - t0
    print(f"2 warm steps: {t_w:.1f}s ({t_w/2:.1f}s/step)", flush=True)
    t0 = time.perf_counter()
    ll1 = m.log_likelihood_iterative_segmented(
        cg_segment_iters=8, slq_iter_segment=6, probe_chunk=8)
    print(f"NLML after 5 steps: {ll1:.2f}  ({time.perf_counter()-t0:.1f}s)  "
          f"(improved: {ll1 > ll0})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
