"""Does windowing restore XLA TPU gather throughput at n=1M sources?

RESULTS_r5 §8: the 1M SKI interpolation gathers run ~5x under the r3
3.2G elem/s number because the gather source (B, n) = 16 MB no longer fits
VMEM (the 100k measurements gathered from 400 KB rows).  Hypothesis: a
lax.scan over cell blocks, each reading a contiguous (B, Wr) window via
dynamic_slice (sequential DMA) and gathering window-LOCAL indices from the
VMEM-resident window, restores the small-source throughput.

Measures (chained-loop slope timing per CLAUDE.md):
  1. raw gather throughput vs source size S (where is the cliff?)
  2. one big gather: B*M*K elems from a (B, n) source     [current ELL cost]
  3. windowed scan: same element count, per-block windows [the candidate]
  4. windowed scan for the forward W analog (16 corners)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_windowed_gather.py
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
    B = 4
    n = 32**4  # = M: the n >= m regime, shape-compatible folds
    M = 32**4
    K = 20

    # ---- 1. raw gather throughput vs source size --------------------------
    L = 8_388_608  # elements gathered per application (per batch row)
    for S in (16_384, 65_536, 262_144, 1_048_576, 4_194_304):
        src = jnp.asarray(rng.standard_normal((B, S)).astype("float32"))
        idx = jnp.asarray(rng.integers(0, S, size=(L,)), jnp.int32)

        def g(v, idx=idx, S=S):
            # constant-cost fold: carry stays (B, S), gather not DCE'd
            out = v[:, idx]  # (B, L)
            return v + out[:, :S] * 1e-30

        t = timed(g, src)
        eps = B * L / t
        print(f"raw gather: src {S:>8} ({B*S*4/2**20:6.1f} MB)  "
              f"{t*1e3:7.2f} ms  {eps/1e9:6.2f} G elem/s", flush=True)

    # ---- 2. one big gather (current ELL shape) -----------------------------
    u = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
    slot_src = jnp.asarray(rng.integers(0, n, size=(M, K)), jnp.int32)
    slot_w = jnp.asarray(rng.standard_normal((M, K)).astype("float32"))

    def ell_big(v):
        out = jnp.sum(slot_w[None] * v[:, slot_src], axis=-1)  # (B, M)
        return v + out * 1e-30  # n == M

    t = timed(ell_big, u)
    print(f"\nELL big-source: {t*1e3:7.2f} ms  "
          f"{B*M*K/t/1e9:6.2f} G elem/s (gathered)", flush=True)

    # ---- 3. windowed scan (candidate Wt) -----------------------------------
    for Cb in (4096, 8192, 16384):
        T = M // Cb
        Wr = 41_984 if Cb == 8192 else int(np.ceil((Cb + 35_000) * (n / M) / 128) * 128)
        Wr = min(Wr, n)
        starts = jnp.asarray(
            np.minimum(rng.integers(0, n - Wr, size=(T,)), n - Wr), jnp.int32
        )
        loc = jnp.asarray(rng.integers(0, Wr, size=(T, Cb, K)), jnp.int32)
        wts = jnp.asarray(rng.standard_normal((T, Cb, K)).astype("float32"))

        def wt_win(v, starts=starts, loc=loc, wts=wts, T=T, Cb=Cb, Wr=Wr):
            def body(carry, inp):
                s, lc, w = inp
                win = lax.dynamic_slice(v, (0, s), (B, Wr))  # (B, Wr)
                g = win[:, lc.reshape(-1)].reshape(B, Cb, K)
                return carry, jnp.sum(w[None] * g, axis=-1)  # (B, Cb)

            _, blocks = lax.scan(body, 0, (starts, loc, wts))  # (T, B, Cb)
            out = jnp.moveaxis(blocks, 1, 0).reshape(B, T * Cb)
            return v + out * 1e-30  # n == M == T*Cb

        t = timed(wt_win, u)
        print(f"windowed Wt (Cb={Cb:5}, T={T:3}, Wr={Wr}): {t*1e3:7.2f} ms  "
              f"{B*M*K/t/1e9:6.2f} G elem/s", flush=True)

    # ---- 4. forward W analog: 16 corners, window over lattice --------------
    v_lat = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
    P = 8192  # points per block
    Tp = n // P
    Wc = int(np.ceil((P * (M / n) + 35_000) / 128) * 128)
    startsc = jnp.asarray(
        np.minimum(rng.integers(0, M - Wc, size=(Tp,)), M - Wc), jnp.int32
    )
    locc = jnp.asarray(rng.integers(0, Wc, size=(Tp, P, 16)), jnp.int32)
    wc = jnp.asarray(rng.standard_normal((Tp, P, 16)).astype("float32"))

    def w_win(v):
        def body(carry, inp):
            s, lc, w = inp
            win = lax.dynamic_slice(v, (0, s), (B, Wc))
            g = win[:, lc.reshape(-1)].reshape(B, P, 16)
            return carry, jnp.sum(w[None] * g, axis=-1)  # (B, P)

        _, blocks = lax.scan(body, 0, (startsc, locc, wc))  # (Tp, B, P)
        out = jnp.moveaxis(blocks, 1, 0).reshape(B, Tp * P)
        return v + out * 1e-30  # M == Tp*P

    t = timed(w_win, v_lat)
    print(f"windowed W  (P={P}, Tp={Tp}, Wc={Wc}): {t*1e3:7.2f} ms  "
          f"{B*n*16/t/1e9:6.2f} G elem/s", flush=True)

    # current forward W: one fused gather of (B, 16, n) from (B, M)
    gather_flat = jnp.asarray(rng.integers(0, M, size=(16, n)), jnp.int32)
    gather_w = jnp.asarray(rng.standard_normal((16, n)).astype("float32"))

    def w_big(v):
        g = v[:, gather_flat]  # (B, 16, n)
        out = jnp.sum(gather_w[None] * g, axis=1)  # (B, n)
        return v + out * 1e-30

    t = timed(w_big, v_lat)
    print(f"W big-source: {t*1e3:7.2f} ms  {B*n*16/t/1e9:6.2f} G elem/s",
          flush=True)


if __name__ == "__main__":
    main()
