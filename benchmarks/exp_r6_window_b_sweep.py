"""Windowed-apply throughput vs batch B (window slice bytes scale with B).

The gather-size budget (`_GATHER_IDX_BUDGET`) controls the per-iteration
INDEX count, which is B-independent — but the (B, Wr) window slice and the
(B, Cb·K) gather output scale with B, and the raw SOURCE-size cliff sits
near 1–4 MB (RESULTS_r6 §1).  Solver batch sizes span B=1 (rhs) to B=17
(monolithic CG with 16 probes).  Measures the real-plan composed wtw and
the per-direction applies across B at the 1M/32⁴ shape.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_window_b_sweep.py [n] [md]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu.ops.interp import interp_weights
from gp_grief_tpu.ops.interp_windowed import (
    _matvec_impl,
    _rmatvec_impl,
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
    print(f"n={n} M={M} T={wplan.T} Cb={wplan.Cb} Wr={wplan.Wr} K={K}",
          flush=True)

    for B in (1, 2, 4, 8, 16):
        v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
        t = timed(lambda vv: _rmatvec_impl(wplan, _matvec_impl(wplan, vv)), v)
        win_mb = B * wplan.Wr * 4 / 2**20
        print(f"B={B:2}: composed wtw {t*1e3:7.1f} ms  "
              f"({t/B*1e3:6.1f} ms/col, Wt win {win_mb:5.2f} MB)", flush=True)


if __name__ == "__main__":
    main()
