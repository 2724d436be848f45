"""Round-5: trainable matrix-free exact GP (VERDICT r4 weak #4 / next #6).

Measures, on the real chip:

1. Segmented matrix-free NLML at n=2^17 and n=500k across operating points:
   - f32 (the r14 baseline: 585.8 s at 500k),
   - mixed16 (bf16-MXU Gram slabs in the CG inner iterations under exact
     refinement — quadratic term exact-grade),
   - mixed16 + mixed16_slq (bf16 slabs in the SLQ probes too — the applies
     that dominate; the log-det bias this buys is THE measurement here).
2. optimize() (3 Adam steps) at n=2^17 with the differentiable iterative
   loss (cg_solve_refined inside value_and_grad) — the "trainable" bar.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r15_mixed16.py [--big]
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


def make_model(n, seed=0, mixed16=False):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 8, size=(n, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) * np.cos(0.7 * x[:, 1])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return GPRegression(
        x, y, make_kernel("rbf", lengthscale=0.8, input_dim=2),
        noise_var=0.05, solver="iterative", precond_rank=128,
        num_probes=8, lanczos_iters=24, cg_tol=1e-6, cg_iters=400,
        mixed16=mixed16,
    )


def timed_nlml(model, n, **kw):
    seg = 8 if n >= 400_000 else 25
    itseg = 6 if n >= 400_000 else None
    # fuse_probes=False: this script isolates the PRECISION axis (f32 vs
    # mixed16) against the r14 separate-pass baseline; the fuse-vs-separate
    # partitioning axis is measured by exp_r15_fused_gp.py.
    kw.setdefault("fuse_probes", False)
    t0 = time.perf_counter()
    ll = model.log_likelihood_iterative_segmented(
        cg_segment_iters=seg, slq_iter_segment=itseg, probe_chunk=8, **kw
    )
    return ll, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="also run n=500k")
    ap.add_argument("--skip-fit", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    n = 1 << 17
    m32 = make_model(n)
    m16 = make_model(n, mixed16=True)

    ll_a, t_a = timed_nlml(m32, n)
    print(f"[n={n}] f32:            NLML={ll_a:.6f}  {t_a:.1f}s", flush=True)
    ll_b, t_b = timed_nlml(m16, n)
    print(f"[n={n}] mixed16:        NLML={ll_b:.6f}  {t_b:.1f}s  "
          f"rel={abs(ll_b-ll_a)/abs(ll_a):.2e}", flush=True)
    ll_c, t_c = timed_nlml(m16, n, mixed16_slq=True)
    print(f"[n={n}] mixed16+slq16:  NLML={ll_c:.6f}  {t_c:.1f}s  "
          f"rel={abs(ll_c-ll_a)/abs(ll_a):.2e}  speedup={t_a/t_c:.2f}x",
          flush=True)

    if not args.skip_fit:
        # Trainable: 3 Adam steps through the differentiable iterative loss.
        # scan_chunk=1 keeps each device program to ONE value_and_grad (the
        # ~60 s per-program-execution watchdog binds; a 3-step scanned
        # program at n=2^17 would exceed it).  2^16 first (safely inside the
        # watchdog), then 2^17.
        for nf in (1 << 16, 1 << 17):
            mf = make_model(nf, mixed16=True)
            try:
                t0 = time.perf_counter()
                res = mf.optimize(max_iters=3, optimizer="adam",
                                  learning_rate=0.05, scan_chunk=1, tol=0.0)
                t_fit = time.perf_counter() - t0
                print(f"[n={nf}] optimize 3 steps (mixed16 loss): "
                      f"{t_fit:.1f}s total ({t_fit/3:.1f}s/step incl compile), "
                      f"loss trace {['%.1f' % float(v) for v in res.losses[:4]]}",
                      flush=True)
                t0 = time.perf_counter()
                mf.optimize(max_iters=2, optimizer="adam",
                            learning_rate=0.05, scan_chunk=1, tol=0.0)
                t_w = time.perf_counter() - t0
                print(f"[n={nf}] warm 2 more steps: {t_w:.1f}s "
                      f"({t_w/2:.1f}s/step)", flush=True)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"[n={nf}] optimize FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if args.big:
        n2 = 500_000
        b32 = make_model(n2)
        b16 = make_model(n2, mixed16=True)
        ll_a2, t_a2 = timed_nlml(b32, n2)
        print(f"[n={n2}] f32:           NLML={ll_a2:.6f}  {t_a2:.1f}s", flush=True)
        ll_c2, t_c2 = timed_nlml(b16, n2, mixed16_slq=True)
        print(f"[n={n2}] mixed16+slq16: NLML={ll_c2:.6f}  {t_c2:.1f}s  "
              f"rel={abs(ll_c2-ll_a2)/abs(ll_a2):.2e}  "
              f"speedup={t_a2/t_c2:.2f}x", flush=True)
        ll_b2, t_b2 = timed_nlml(b16, n2)
        print(f"[n={n2}] mixed16:       NLML={ll_b2:.6f}  {t_b2:.1f}s  "
              f"rel={abs(ll_b2-ll_a2)/abs(ll_a2):.2e}  "
              f"speedup={t_a2/t_b2:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
