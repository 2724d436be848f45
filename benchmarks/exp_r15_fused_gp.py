"""Round-5: fused CG+SLQ segmented NLML for the matrix-free exact GP.

The 500k NLML is SLQ-bound (exp_r15_mixed16: mixed16-CG bought only 1.04×
because ≈24 of ~40 Gram sweeps are SLQ applies).  The Gram-slab rebuild is
FLAT in the batch size, so fusing the CG advance into the SLQ probe applies
(ops/fused.py: fused_cg_slq_segmented — one (1+R, n) apply per iteration)
makes the total sweeps ~max(CG, SLQ) instead of their sum.  This measures
fused vs separate at n=2¹⁷ and n=500k on the chip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r15_fused_gp.py [--big]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

from gp_grief_tpu import GPRegression, make_kernel


def make_model(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 8, size=(n, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) * np.cos(0.7 * x[:, 1])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return GPRegression(
        x, y, make_kernel("rbf", lengthscale=0.8, input_dim=2),
        noise_var=0.05, solver="iterative", precond_rank=128,
        num_probes=8, lanczos_iters=24, cg_tol=1e-6, cg_iters=400,
    )


def timed(model, n, fuse):
    seg = 8 if n >= 400_000 else 25
    itseg = 6 if n >= 400_000 else None
    t0 = time.perf_counter()
    ll = model.log_likelihood_iterative_segmented(
        cg_segment_iters=seg, slq_iter_segment=itseg, probe_chunk=8,
        fuse_probes=fuse,
    )
    return ll, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    for n in ([1 << 17] + ([500_000] if args.big else [])):
        m = make_model(n)
        ll_s, t_s = timed(m, n, False)
        print(f"[n={n}] separate: NLML={ll_s:.6f}  {t_s:.1f}s", flush=True)
        ll_f, t_f = timed(m, n, True)
        print(f"[n={n}] fused:    NLML={ll_f:.6f}  {t_f:.1f}s  "
              f"rel={abs(ll_f-ll_s)/abs(ll_s):.2e}  speedup={t_s/t_f:.2f}x",
              flush=True)
        ll_f2, t_f2 = timed(m, n, True)
        print(f"[n={n}] fused warm repeat: {t_f2:.1f}s "
              f"(speedup {t_s/t_f2:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
