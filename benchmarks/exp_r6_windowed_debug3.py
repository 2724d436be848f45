"""Debug round 3: replicate the EXACT failing 1M lattice-dual programs.

Round-2 findings (exp_r6_windowed_debug2): B=1 fused perm+Wᵀ(+epilogue) is
bit-exact; the flat composed reference 413'd the relay (closure-captured
plan constants — own bug in the debug script, not the library).  Here every
program is hoisted via explicit_closure (as the model does), and we
replicate the actual NLML path pieces at n=1M:

  1. vt = msqrt(Wᵀ y)      — windowed vs flat, one program each
  2. white(v)              — windowed vs flat, one program each
  3. composed wtw          — one program vs two-program chaining
  4. scan vs unrolled      — correctness + chained-loop timing

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_windowed_debug3.py [n] [md]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.ops.interp import (
    build_interp_plan,
    interp_matvec_bm_fast,
    interp_rmatvec_bm_exact,
    interp_weights,
)
from gp_grief_tpu.ops.interp_windowed import (
    _matvec_unrolled,
    _rmatvec_unrolled,
    build_windowed_plan,
    make_windowed_ops,
)
from gp_grief_tpu.ops.kron import kron_eigh
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.utils.closure import explicit_closure


def jrun(fn, *args):
    """jit with hoisted closure constants (the model-path convention)."""
    sds = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
    pure, consts = explicit_closure(fn, *sds)
    return jax.jit(pure)(consts, *args)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
    return f"rel={d:.3e}  |a|={np.linalg.norm(a):.4e} |b|={np.linalg.norm(b):.4e}"


def timed(fn, x, iters=10):
    def make(nloops):
        def run(v):
            def body(i, vv):
                return jax.lax.optimization_barrier(fn(vv))

            v = jax.lax.fori_loop(0, nloops, body, v)
            return jnp.sum(v.reshape(-1)[:8])

        pure, consts = explicit_closure(run, jax.ShapeDtypeStruct(x.shape, x.dtype))
        return jax.jit(pure), consts

    short, long = make(2), make(2 + iters)

    def best(jc, reps=2):
        f, c = jc
        _ = float(f(c, x))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f(c, x))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(long) - best(short)) / iters, 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    md = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    d = 4
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    y = jnp.asarray(rng.standard_normal(n).astype("float32"))
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md ** d
    iw = interp_weights(jnp.asarray(x), xg)
    plan = build_interp_plan(iw)
    wplan = build_windowed_plan(iw)
    mv_s, rmv_s = make_windowed_ops(wplan)
    print(f"n={n} M={M} T={wplan.T} Wr={wplan.Wr} K={wplan.wt_loc.shape[-1]}",
          flush=True)

    # lattice spectra (as _make_lattice_ops does)
    kerns = [make_kernel("rbf", lengthscale=0.8) for _ in range(d)]
    factors = cov_grid(kerns, tuple(jnp.asarray(g) for g in xg), dim_noise_var=0.0)
    sigma2 = jnp.asarray(0.1, jnp.float32)

    def spectra():
        Qs, lams = kron_eigh(factors)
        lam = jnp.ones((1,), jnp.float32)
        for l_ in lams:
            lam = (lam[:, None] * l_[None, :]).reshape(-1)
        lam = jnp.maximum(lam, 0.0)
        cbar = 0.95  # close enough for a numerical probe
        wjs = jnp.sqrt(lam / (sigma2 + cbar * lam))
        return Qs, wjs

    Qs, wjs = jrun(spectra)
    QsT = tuple(Q.T for Q in Qs)

    def msqrt(v_bm):
        B = v_bm.shape[0]
        eyeB = jnp.eye(B, dtype=v_bm.dtype)
        t = kron_matvec_fast((eyeB, *QsT), v_bm.reshape(-1)).reshape(B, -1)
        t = t * wjs[None, :]
        return kron_matvec_fast((eyeB, *Qs), t.reshape(-1)).reshape(B, -1)

    # ---- 1. vt = msqrt(Wt y): the rhs program ------------------------------
    vt_win = jrun(lambda yy: msqrt(rmv_s(yy[None, :][:, wplan.perm])), y)
    vt_flat = jrun(lambda yy: msqrt(interp_rmatvec_bm_exact(plan, yy[None, :])), y)
    print("vt (msqrt∘Wt∘perm) win vs flat:", rel(vt_win, vt_flat), flush=True)

    # ---- 2. white(v): the CG operator program ------------------------------
    cbar = 0.95

    def white_win(v_bm):
        u = msqrt(v_bm)
        return v_bm + msqrt(rmv_s(mv_s(u)) - cbar * u)

    def white_flat(v_bm):
        u = msqrt(v_bm)
        t = interp_rmatvec_bm_exact(plan, interp_matvec_bm_fast(plan, u))
        return v_bm + msqrt(t - cbar * u)

    for B in (1, 2):
        v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
        a = jrun(white_win, v)
        b = jrun(white_flat, v)
        print(f"B={B} white win vs flat:", rel(a, b), flush=True)

    # ---- 3. composed wtw: one program vs chained programs ------------------
    B = 4
    v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
    one = jrun(lambda vv: rmv_s(mv_s(vv)), v)
    two = jrun(rmv_s, jrun(mv_s, v))
    print("wtw one-program vs chained:", rel(one, two), flush=True)
    unr = jrun(lambda vv: _rmatvec_unrolled(wplan, _matvec_unrolled(wplan, vv)), v)
    print("wtw UNROLLED vs chained:", rel(unr, two), flush=True)

    # ---- 4. timings ---------------------------------------------------------
    t = timed(lambda vv: rmv_s(mv_s(vv)), v)
    print(f"wtw scan     (B={B}): {t*1e3:.1f} ms", flush=True)
    t = timed(lambda vv: _rmatvec_unrolled(wplan, _matvec_unrolled(wplan, vv)), v)
    print(f"wtw unrolled (B={B}): {t*1e3:.1f} ms", flush=True)
    t = timed(white_win, v)
    print(f"white windowed (B={B}): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
