"""Perf bisect: why is the composed windowed wtw 341 ms when the synthetic
same-shape pieces sum to ~115 ms?

Variants at the 1M/32⁴ geometry (all chained-loop slope timed):
  A. real-plan rmv alone, mv alone (round-trip via cheap pad/slice)
  B. real-plan composed rmv(mv(v))       [the shipped hot path]
  C. synthetic tables, same static shapes (K from the real plan),
     isolated and composed — separates index-distribution effects
     from composition effects.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_windowed_perf.py [n] [md]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gp_grief_tpu.ops.interp import interp_weights
from gp_grief_tpu.ops.interp_windowed import (
    WindowedPlan,
    _matvec_impl,
    _matvec_unrolled,
    _rmatvec_impl,
    _rmatvec_unrolled,
    build_windowed_plan,
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    md = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    d = 4
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md ** d
    iw = interp_weights(jnp.asarray(x), xg)
    wplan = build_windowed_plan(iw)
    K = int(wplan.wt_loc.shape[-1])
    C2 = int(wplan.w_loc.shape[-1])
    print(f"n={n} M={M} T={wplan.T} Cb={wplan.Cb} Wr={wplan.Wr} K={K} "
          f"Tp={wplan.Tp} P={wplan.P} Wc={wplan.Wc} ov={wplan.ov_ids.shape[0]}",
          flush=True)

    B = 4
    u = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
    v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))

    # A. real tables, isolated
    pad = M - n if M >= n else 0

    def rmv_rt(uu):  # (B, n) carry
        out = _rmatvec_impl(wplan, uu)  # (B, M)
        return out[:, :n]

    def mv_rt(vv):  # (B, M) carry
        out = _matvec_impl(wplan, vv)  # (B, n)
        return jnp.pad(out, ((0, 0), (0, pad)))

    t = timed(rmv_rt, u)
    print(f"A real Wt alone: {t*1e3:7.1f} ms", flush=True)
    t = timed(mv_rt, v)
    print(f"A real W  alone: {t*1e3:7.1f} ms", flush=True)
    t = timed(lambda vv: _rmatvec_impl(wplan, _matvec_impl(wplan, vv)), v)
    print(f"B real composed: {t*1e3:7.1f} ms", flush=True)

    # real tables but WITHOUT the overflow scatter
    plan_noov = wplan._replace(
        ov_ids=jnp.zeros((0,), jnp.int32),
        ov_src=jnp.zeros((0,), jnp.int32),
        ov_w=jnp.zeros((0,), wplan.ov_w.dtype),
    )
    t = timed(lambda vv: _rmatvec_impl(plan_noov, _matvec_impl(plan_noov, vv)), v)
    print(f"B real composed, no overflow: {t*1e3:7.1f} ms", flush=True)

    # C. synthetic tables, same shapes
    syn = wplan._replace(
        wt_loc=jnp.asarray(
            rng.integers(0, wplan.Wr, size=(wplan.T, wplan.Cb, K)), jnp.int32
        ),
        wt_w=jnp.asarray(
            rng.standard_normal((wplan.T, wplan.Cb, K)).astype("float32")
        ),
        w_loc=jnp.asarray(
            rng.integers(0, wplan.Wc, size=(wplan.Tp, wplan.P, C2)), jnp.int32
        ),
        w_w=jnp.asarray(
            rng.standard_normal((wplan.Tp, wplan.P, C2)).astype("float32")
        ),
        ov_ids=jnp.zeros((0,), jnp.int32),
        ov_src=jnp.zeros((0,), jnp.int32),
        ov_w=jnp.zeros((0,), wplan.ov_w.dtype),
    )

    def rmv_syn(uu):
        return _rmatvec_impl(syn, uu)[:, :n]

    def mv_syn(vv):
        return jnp.pad(_matvec_impl(syn, vv), ((0, 0), (0, pad)))

    t = timed(rmv_syn, u)
    print(f"C syn  Wt alone: {t*1e3:7.1f} ms", flush=True)
    t = timed(mv_syn, v)
    print(f"C syn  W  alone: {t*1e3:7.1f} ms", flush=True)
    t = timed(lambda vv: _rmatvec_impl(syn, _matvec_impl(syn, vv)), v)
    print(f"C syn  composed: {t*1e3:7.1f} ms", flush=True)

    # D. unrolled real, isolated
    t = timed(lambda uu: _rmatvec_unrolled(wplan, uu)[:, :n], u)
    print(f"D real Wt unrolled alone: {t*1e3:7.1f} ms", flush=True)
    t = timed(lambda vv: jnp.pad(_matvec_unrolled(wplan, vv), ((0, 0), (0, pad))), v)
    print(f"D real W  unrolled alone: {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
