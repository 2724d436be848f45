"""Prototype timings: factored windowed interpolation applies (1M/32^4, B=8).

Variants (synthetic tables with the real geometry; timing only):
  w1: shipped windowed Wt (ELL over all-corner cells, K=20)    [baseline]
  w2: base-cell ELL (K=8) + 16 per-offset weighted sums + roll epilogue
  w3: slice-gather runs (cells' points are contiguous in sorted order):
      8-wide u slices + 64-wide interleaved per-dim weight slices
  f1: shipped windowed W (per-point 2^d corner gather)          [baseline]
  f2: interleaved V16 lattice + per-point 16-wide slice gather

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r8_factored_proto.py
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


def timed(fn, args, iters=10):
    """Chained slope timing; dependency forced via a tiny add-back."""

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
    B, n = 8, 1_000_000
    shape = (32, 32, 32, 32)
    M = int(np.prod(shape))
    d = 4
    u = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

    # ---- w1: shipped geometry: Cb=4096, K=20, Wr=40960 -------------------
    Cb1, K1, Wr1 = 4096, 20, 40960
    T1 = -(-M // Cb1)
    starts1 = jnp.asarray(
        np.minimum(np.arange(T1) * int(n * Cb1 / M), n - Wr1).astype(np.int32))
    lc1 = jnp.asarray(rng.integers(0, Wr1, (T1, Cb1, K1)).astype(np.int32))
    ww1 = jnp.asarray(rng.standard_normal((T1, Cb1, K1)).astype(np.float32))

    def w1(us, st, lc, ww):
        def body(_, inp):
            s, l, w = inp
            win = lax.dynamic_slice(us, (jnp.zeros((), s.dtype), s), (B, Wr1))
            g = win[:, l.reshape(-1)].reshape(B, Cb1, K1)
            return _, jnp.sum(w[None] * g, axis=-1)
        _, blocks = lax.scan(body, 0, (st, lc, ww))
        return jnp.moveaxis(blocks, 1, 0).reshape(B, T1 * Cb1)

    t = timed(w1, (u, starts1, lc1, ww1))
    print(f"w1 shipped Wt (K={K1}): {t*1e3:.1f} ms", flush=True)

    # ---- w2: base-cell ELL K=8, 16 weighted sums + rolls ----------------
    Cb2, K2 = 8192, 8
    T2 = -(-M // Cb2)
    Wr2 = 12288  # ~Cb2 * density + margin
    starts2 = jnp.asarray(
        np.minimum(np.arange(T2) * int(n * Cb2 / M), n - Wr2).astype(np.int32))
    lc2 = jnp.asarray(rng.integers(0, Wr2, (T2, Cb2, K2)).astype(np.int32))
    ww2 = jnp.asarray(rng.standard_normal((T2, 16, Cb2, K2)).astype(np.float32))
    rolls = [int(np.sum([o * s for o, s in zip(off, (33825 // 32, 1056 // 32, 33, 1))]))
             for off in [(a, b, c, e) for a in (0, 1) for b in (0, 1)
                         for c in (0, 1) for e in (0, 1)]]

    def w2(us, st, lc, ww):
        def body(_, inp):
            s, l, w = inp
            win = lax.dynamic_slice(us, (jnp.zeros((), s.dtype), s), (B, Wr2))
            g = win[:, l.reshape(-1)].reshape(B, Cb2, K2)
            outs = [jnp.sum(w[o][None] * g, axis=-1) for o in range(16)]
            return _, jnp.stack(outs)
        _, blocks = lax.scan(body, 0, (st, lc, ww))  # (T2, 16, B, Cb2)
        lat = jnp.moveaxis(blocks, 0, 1).reshape(16, B, T2 * Cb2)
        out = lat[0]
        for o in range(1, 16):
            out = out + jnp.roll(lat[o], rolls[o] % 128, axis=-1)
        return out

    t = timed(w2, (u, starts2, lc2, ww2))
    print(f"w2 base-ELL Wt (K={K2}, 16 sums + rolls): {t*1e3:.1f} ms", flush=True)

    # ---- w3: slice-gather runs ------------------------------------------
    # per cell: one 8-wide u slice at cell_start, one 64-wide weight slice
    Cb3 = 8192
    T3 = -(-M // Cb3)
    Wr3 = 12288
    starts3 = starts2
    cstart = jnp.asarray(rng.integers(0, Wr3 - 8, (T3, Cb3)).astype(np.int32))
    wint = jnp.asarray(rng.standard_normal((8 * n,)).astype(np.float32))
    wstart = jnp.asarray(rng.integers(0, 8 * n - 64, (T3, Cb3)).astype(np.int32))
    cnt = jnp.asarray(rng.integers(0, 3, (T3, Cb3)).astype(np.int32))

    def w3(us, st, cs, wst, ct):
        iota8 = jnp.arange(8, dtype=jnp.int32)

        def body(_, inp):
            s, c, wsrow, ctrow = inp
            win = lax.dynamic_slice(us, (jnp.zeros((), s.dtype), s), (B, Wr3))

            def urow(row):
                return jax.vmap(lambda sc: lax.dynamic_slice(row, (sc,), (8,)))(c)
            g = jax.vmap(urow)(win)                      # (B, Cb3, 8)
            wsl = jax.vmap(lambda sc: lax.dynamic_slice(wint, (sc,), (64,)))(wsrow)
            wsl = wsl.reshape(Cb3, 8, 8)                 # (cells, slot, dims*2)
            mask = (iota8[None, :] < ctrow[:, None]).astype(jnp.float32)
            outs = []
            for o in range(16):
                # emulate the 16 per-offset products: pick 4 of the 8 dim-weights
                w_o = wsl[:, :, o % 8] * wsl[:, :, (o // 2) % 8]
                outs.append(jnp.sum((w_o * mask)[None] * g, axis=-1))
            return _, jnp.stack(outs)
        _, blocks = lax.scan(body, 0, (st, cs, wst, ct))
        lat = jnp.moveaxis(blocks, 0, 1).reshape(16, B, T3 * Cb3)
        out = lat[0]
        for o in range(1, 16):
            out = out + jnp.roll(lat[o], rolls[o] % 128, axis=-1)
        return out

    t = timed(w3, (u, starts3, cstart, wstart, cnt))
    print(f"w3 slice-run Wt (8-wide u, 64-wide w): {t*1e3:.1f} ms", flush=True)

    # ---- f1: shipped W (P=8192, 16 plain gathers) -----------------------
    P, Wc = 8192, 16384
    Tp = -(-n // P)
    v = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))
    wst1 = jnp.asarray(np.minimum(np.arange(Tp) * int(M * P / n), M - Wc).astype(np.int32))
    wlc = jnp.asarray(rng.integers(0, Wc, (Tp, P, 16)).astype(np.int32))
    wwf = jnp.asarray(rng.standard_normal((Tp, P, 16)).astype(np.float32))

    def f1(vl, st, lc, ww):
        def body(_, inp):
            s, l, w = inp
            win = lax.dynamic_slice(vl, (jnp.zeros((), s.dtype), s), (B, Wc))
            g = win[:, l.reshape(-1)].reshape(B, P, 16)
            return _, jnp.sum(w[None] * g, axis=-1)
        _, blocks = lax.scan(body, 0, (st, lc, ww))
        return jnp.moveaxis(blocks, 1, 0).reshape(B, Tp * P)

    t = timed(f1, (v, wst1, wlc, wwf))
    print(f"f1 shipped W: {t*1e3:.1f} ms", flush=True)

    # ---- f2: interleaved V16 + 16-wide slice gather ---------------------
    Wc16 = 16 * Wc

    def f2(vl, st, lc, ww):
        # build V16: 16 rolls interleaved (realistic construction cost)
        shifted = [jnp.roll(vl, -(rolls[o] % 128), axis=1) for o in range(16)]
        V16 = jnp.stack(shifted, axis=-1).reshape(B, 16 * M)

        def body(_, inp):
            s, l, w = inp
            win = lax.dynamic_slice(V16, (jnp.zeros((), s.dtype), 16 * s), (B, Wc16))
            pstart = (l[:, 0] * 16).astype(jnp.int32)

            def vrow(row):
                return jax.vmap(lambda sc: lax.dynamic_slice(row, (sc,), (16,)))(pstart)
            g = jax.vmap(vrow)(win)                      # (B, P, 16)
            return _, jnp.sum(w[None] * g, axis=-1)
        _, blocks = lax.scan(body, 0, (st, lc, ww))
        return jnp.moveaxis(blocks, 1, 0).reshape(B, Tp * P)

    t = timed(f2, (v, wst1, wlc, wwf))
    print(f"f2 V16 + 16-wide slice W: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
