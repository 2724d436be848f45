"""Windowed-gather throughput vs batch B (window bytes scale with B).

The windowed plan fixes Wr by geometry; the slice is (B, Wr).  At B=4 the
window is ~670 KB (measured 1.5 G elem/s); at B=16 it is ~2.7 MB — possibly
past the source-size cliff (raw gathers dropped to 0.4 G at 4 MB sources).
SLQ probe chunks and multi-rhs CG run at B ∈ [5, 17], so this matters.
Sweeps B for the synthetic windowed Wt and the flat big-source form.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_window_b_sweep.py
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

from gp_grief_tpu.utils.closure import explicit_closure


def timed(fn, x, iters=10):
    def make(nloops):
        def run(v):
            def body(i, vv):
                return lax.optimization_barrier(fn(vv))

            v = lax.fori_loop(0, nloops, body, v)
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
    rng = np.random.default_rng(0)
    n = M = 32**4
    K = 20
    Cb, T, Wr = 8192, M // 8192, 41_984
    starts = jnp.asarray(np.minimum(rng.integers(0, n - Wr, size=(T,)), n - Wr), jnp.int32)
    loc = jnp.asarray(rng.integers(0, Wr, size=(T, Cb, K)), jnp.int32)
    wts = jnp.asarray(rng.standard_normal((T, Cb, K)).astype("float32"))
    slot_src = jnp.asarray(rng.integers(0, n, size=(M, K)), jnp.int32)
    slot_w = jnp.asarray(rng.standard_normal((M, K)).astype("float32"))

    for B in (2, 4, 8, 16):
        u = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))

        def wt_win(v, B=B):
            def body(carry, inp):
                s, lc, w = inp
                win = lax.dynamic_slice(v, (0, s), (B, Wr))
                g = win[:, lc.reshape(-1)].reshape(B, Cb, K)
                return carry, jnp.sum(w[None] * g, axis=-1)

            _, blocks = lax.scan(body, 0, (starts, loc, wts))
            out = jnp.moveaxis(blocks, 1, 0).reshape(B, T * Cb)
            return v + out * 1e-30

        def ell_big(v):
            out = jnp.sum(slot_w[None] * v[:, slot_src], axis=-1)
            return v + out * 1e-30

        tw = timed(wt_win, u)
        tb = timed(ell_big, u)
        print(f"B={B:2}: windowed {tw*1e3:7.2f} ms ({B*M*K/tw/1e9:5.2f} G) "
              f"win={B*Wr*4/2**20:5.2f} MB | flat {tb*1e3:7.2f} ms "
              f"({B*M*K/tb/1e9:5.2f} G)  speedup {tb/tw:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
