"""Debug round 2: windowed applies — B sensitivity and fused-program checks.

The broken 1M NLML path applies Wᵀ at B=1 (the y rhs) and B=2 (SLQ probe
chunks) inside programs that fuse the perm gather, the windowed scans, and
Kron matvecs.  exp_r6_windowed_debug verified isolated B=4 applies; this
script checks B ∈ {1, 2, 4} and the fused rhs-style program
``msqrt_like(Wᵀ(u[:, perm]))`` against the flat path.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_windowed_debug2.py [n] [md]
"""

import sys

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
from gp_grief_tpu.utils.closure import explicit_closure


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


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
    return f"rel={d:.3e}  |a|={np.linalg.norm(a):.4e} |b|={np.linalg.norm(b):.4e}"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    md = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    d = 4
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md ** d
    iw = interp_weights(jnp.asarray(x), xg)
    plan = build_interp_plan(iw)
    wplan = build_windowed_plan(iw)
    mv_s, rmv_s = make_windowed_ops(wplan)
    print(f"n={n} M={M} T={wplan.T} Wr={wplan.Wr} K={wplan.wt_loc.shape[-1]}",
          flush=True)

    for B in (1, 2, 4):
        u = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
        ref = jax.jit(lambda uu: interp_rmatvec_bm_exact(plan, uu))(u)
        got = jax.jit(lambda uu: rmv_s(uu[:, wplan.perm]))(u)
        print(f"B={B} fused perm+Wt  vs flat:", rel(got, ref), flush=True)
        # fused with a lattice-side elementwise epilogue (msqrt-like)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(M,)).astype("float32"))
        ref2 = jax.jit(lambda uu: interp_rmatvec_bm_exact(plan, uu) * scale[None])(u)
        got2 = jax.jit(lambda uu: rmv_s(uu[:, wplan.perm]) * scale[None])(u)
        print(f"B={B} fused + epilogue vs flat:", rel(got2, ref2), flush=True)
        # composed wtw in one program
        v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
        refw = jax.jit(
            lambda vv: interp_rmatvec_bm_exact(plan, interp_matvec_bm_fast(plan, vv))
        )(v)
        gotw = jax.jit(lambda vv: rmv_s(mv_s(vv)))(v)
        print(f"B={B} composed wtw   vs flat:", rel(gotw, refw), flush=True)
        # statically unrolled variants
        gotu = jax.jit(lambda vv: _rmatvec_unrolled(wplan, _matvec_unrolled(wplan, vv)))(v)
        print(f"B={B} UNROLLED wtw   vs flat:", rel(gotu, refw), flush=True)

    # perf at B=4: scan-composed vs unrolled-composed wtw round trips
    B = 4
    v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
    t = timed(lambda vv: rmv_s(mv_s(vv)), v)
    print(f"wtw scan     (B={B}): {t*1e3:.1f} ms", flush=True)
    t = timed(lambda vv: _rmatvec_unrolled(wplan, _matvec_unrolled(wplan, vv)), v)
    print(f"wtw unrolled (B={B}): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
