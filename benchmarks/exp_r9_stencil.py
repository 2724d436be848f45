"""WᵀW stencil at the 1M/32⁴ SKI geometry: build time, exactness, timing.

Compares ops/interp_stencil.py against the shipped windowed pair
(Wᵀ∘W, sorted composition) — the lattice dual's hot loop.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r9_stencil.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gp_grief_tpu.utils.closure import explicit_closure
from gp_grief_tpu.ops.interp import interp_weights, build_corner_stream
from gp_grief_tpu.ops.interp_stencil import build_wtw_stencil, wtw_stencil_bm
from gp_grief_tpu.ops.interp_windowed import build_windowed_plan, make_windowed_ops


def timed(fn, args, iters=10):
    def make(nloops):
        def run(*a):
            def body(i, carry):
                s = carry[0]
                out = fn(s, *carry[1:])
                s = s.at[:1, :1].add(jnp.sum(out[:1, :8]) * 1e-30)
                return (lax.optimization_barrier(s), *carry[1:])

            carry = lax.fori_loop(0, nloops, body, a)
            return jnp.sum(carry[0].reshape(-1)[:8])

        sds = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in args]
        p, c = explicit_closure(run, *sds)
        return jax.jit(p), c

    short, long = make(2), make(2 + iters)

    def best(jc, reps=2):
        f, c = jc
        _ = float(f(c, *args))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f(c, *args))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(long) - best(short)) / iters, 1e-9)


def main():
    rng = np.random.default_rng(0)
    n = 1_000_000
    shape = (32, 32, 32, 32)
    M = int(np.prod(shape))
    d = len(shape)
    xg = [jnp.asarray(np.linspace(0, 1, m)) for m in shape]
    x = jnp.asarray(rng.uniform(0, 1, (n, d)).astype(np.float32))
    iw = interp_weights(x, xg)

    t0 = time.perf_counter()
    st_stream = build_corner_stream(iw)
    t_stream = time.perf_counter() - t0
    print(f"corner stream build: {t_stream:.1f} s", flush=True)

    t0 = time.perf_counter()
    stn = build_wtw_stencil(iw, stream=st_stream)
    t_build = time.perf_counter() - t0
    D = len(stn.deltas)
    print(
        f"stencil build: {t_build:.1f} s, D={D}, tables "
        f"{stn.tables.size * 4 / 1e6:.0f} MB", flush=True,
    )

    t0 = time.perf_counter()
    wplan = build_windowed_plan(iw, stream=st_stream)
    t_wplan = time.perf_counter() - t0
    mv_s, rmv_s = make_windowed_ops(wplan)
    print(f"windowed plan build: {t_wplan:.1f} s", flush=True)

    # --- exactness: stencil vs windowed composition (B=2) -----------------
    v = jnp.asarray(rng.standard_normal((2, M)).astype(np.float32))
    sds = jax.ShapeDtypeStruct(v.shape, v.dtype)
    pw, cw = explicit_closure(lambda vv: rmv_s(mv_s(vv)), sds)
    ref = jax.jit(pw)(cw, v)
    ps, cs = explicit_closure(lambda vv: wtw_stencil_bm(stn, vv), sds)
    got = jax.jit(ps)(cs, v)
    ref_h, got_h = np.asarray(ref), np.asarray(got)
    rel = np.abs(got_h - ref_h).max() / np.abs(ref_h).max()
    print(f"stencil vs windowed wtw rel err: {rel:.3e}", flush=True)

    # --- timings -----------------------------------------------------------
    for B in (2, 8, 16):
        vb = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))
        for bc in (4096, 8192, 16384):
            t = timed(lambda s: wtw_stencil_bm(stn, s, block_cells=bc), (vb,))
            print(f"stencil B={B} C={bc}: {t*1e3:.2f} ms", flush=True)
        t = timed(lambda s: rmv_s(mv_s(s)), (vb,))
        print(f"windowed wtw pair B={B}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
