"""Perf bisect 2: the Wt windowed SCAN is 5x slower at K=26 than the
original K=20 synthetic (299 vs 54 ms).  Sweep K with everything else
fixed; also time the mixed composition (unrolled Wt ∘ scan W) that the
model would ship.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_windowed_k_sweep.py
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
    rng = np.random.default_rng(0)
    B = 4
    n = 1_000_000  # deliberately NOT 2^20: the real shape
    M = 32 ** 4
    Cb, T, Wr = 8192, 128, 42_496
    u = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))

    for K in (16, 20, 24, 26, 32):
        starts = jnp.asarray(
            np.minimum(rng.integers(0, n - Wr, size=(T,)), n - Wr), jnp.int32
        )
        loc = jnp.asarray(rng.integers(0, Wr, size=(T, Cb, K)), jnp.int32)
        wts = jnp.asarray(rng.standard_normal((T, Cb, K)).astype("float32"))

        def wt_scan(v, starts=starts, loc=loc, wts=wts, K=K):
            def body(carry, inp):
                s, lc, w = inp
                win = lax.dynamic_slice(v, (0, s), (B, Wr))
                g = win[:, lc.reshape(-1)].reshape(B, Cb, K)
                return carry, jnp.sum(w[None] * g, axis=-1)

            _, blocks = lax.scan(body, 0, (starts, loc, wts))
            out = jnp.moveaxis(blocks, 1, 0).reshape(B, T * Cb)
            return v + out[:, :n] * 1e-30

        t = timed(wt_scan, u)
        print(f"K={K:2}: Wt scan {t*1e3:7.1f} ms "
              f"({B*M*K/t/1e9:5.2f} G elem/s)", flush=True)

        # flattened-index variant: gather (Cb*K,) then reshape/fold by
        # separate multiply — identical; instead try K-MAJOR tables
        # (T, K, Cb): lane dim Cb=8192 (aligned), sum over axis 1
        lock = jnp.asarray(rng.integers(0, Wr, size=(T, K, Cb)), jnp.int32)
        wtsk = jnp.asarray(rng.standard_normal((T, K, Cb)).astype("float32"))

        def wt_scan_kmaj(v, starts=starts, lock=lock, wtsk=wtsk, K=K):
            def body(carry, inp):
                s, lc, w = inp
                win = lax.dynamic_slice(v, (0, s), (B, Wr))
                g = win[:, lc.reshape(-1)].reshape(B, K, Cb)
                return carry, jnp.sum(w[None] * g, axis=1)

            _, blocks = lax.scan(body, 0, (starts, lock, wtsk))
            out = jnp.moveaxis(blocks, 1, 0).reshape(B, T * Cb)
            return v + out[:, :n] * 1e-30

        t = timed(wt_scan_kmaj, u)
        print(f"K={K:2}: Wt scan K-major {t*1e3:7.1f} ms "
              f"({B*M*K/t/1e9:5.2f} G elem/s)", flush=True)


if __name__ == "__main__":
    main()
