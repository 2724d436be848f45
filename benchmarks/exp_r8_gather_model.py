"""XLA TPU gather cost model: per-index vs per-element, and wide-slice gathers.

Motivation (RESULTS_r8 §4 lead): the windowed SKI applies cost ~5 ns per
gather INDEX, flat in B∈{2..8} — so index-count reduction, not element
reduction, is the lever.  Two candidate re-expressions need the model
confirmed:

* Wᵀ over BASE cells only (K≈6 ELL instead of K≈20-26 over all corners),
  reusing each gathered point value for all 2^d corner-offset weight
  tables (same indices, 16× the arithmetic — free if index-bound);
* W as ONE gather of 16-wide contiguous lane slices from an interleaved
  shifted lattice (n indices instead of n·2^d).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r8_gather_model.py
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


def timed(fn, args, iters=12):
    """Chained-loop slope timing (CLAUDE.md: block_until_ready unreliable)."""

    def make(nloops):
        def run(*a):
            def body(i, carry):
                out = fn(*carry[:-1], carry[-1])
                return (*carry[:-1], lax.optimization_barrier(out))

            carry = lax.fori_loop(0, nloops, body, (*a[:-1], a[-1]))
            return jnp.sum(carry[-1].reshape(-1)[:8])

        sds = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in args]
        p, c = explicit_closure(run, *sds)
        return jax.jit(p), c

    short, long = make(3), make(3 + iters)

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
    B = 8
    # window-sized source (fast gather regime), budget-sized index count
    W = 40960
    NI = 131072  # indices per gather (under the 163,840 cliff)
    src = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, W, NI).astype(np.int32))

    t = timed(lambda s, i, o: s[:, i] + o * 0, (src, idx, jnp.zeros((B, NI), jnp.float32)))
    print(f"A: plain gather {NI} idx x {B} rows: {t*1e3:.3f} ms "
          f"({NI/t*1e-9:.2f} G idx/s, {B*NI/t*1e-9:.2f} G elem/s)")

    # same ELEMENT count via 16-wide contiguous lane slices: NI/16 indices
    NS = NI // 16
    src16 = jnp.asarray(rng.standard_normal((B, W * 16)).astype(np.float32))
    sidx = jnp.asarray((rng.integers(0, W, NS) * 16).astype(np.int32))

    def slice_gather(s, si, o):
        def per_row(row):
            return jax.vmap(lambda st: lax.dynamic_slice(row, (st,), (16,)))(si)
        return jax.vmap(per_row)(s).reshape(B, -1) + o * 0

    t2 = timed(slice_gather, (src16, sidx, jnp.zeros((B, NS * 16), jnp.float32)))
    print(f"B: 16-wide slice gather {NS} idx x {B} rows (same elems): {t2*1e3:.3f} ms "
          f"({NS/t2*1e-9:.2f} G idx/s, {B*NI/t2*1e-9:.2f} G elem/s)")

    # C: reuse one gathered block for 16 weighted sums (the Wt factored form):
    K = 8
    Cb = NI // K
    lc = jnp.asarray(rng.integers(0, W, (Cb, K)).astype(np.int32))
    ws = jnp.asarray(rng.standard_normal((16, Cb, K)).astype(np.float32))

    def gather_1sum(s, l, w, o):
        g = s[:, l.reshape(-1)].reshape(B, Cb, K)
        out = jnp.sum(w[0][None] * g, axis=-1)
        return o.at[:, :Cb].set(out)

    def gather_16sums(s, l, w, o):
        g = s[:, l.reshape(-1)].reshape(B, Cb, K)
        outs = [jnp.sum(w[oo][None] * g, axis=-1) for oo in range(16)]
        return jnp.concatenate(outs, axis=-1) + o * 0

    t3 = timed(gather_1sum, (src, lc, ws, jnp.zeros((B, Cb * 16), jnp.float32)))
    t4 = timed(gather_16sums, (src, lc, ws, jnp.zeros((B, Cb * 16), jnp.float32)))
    print(f"C1: gather {NI} idx + 1 weighted sum:  {t3*1e3:.3f} ms")
    print(f"C2: gather {NI} idx + 16 weighted sums: {t4*1e3:.3f} ms "
          f"(marginal cost of 15 extra sums: {(t4-t3)*1e3:.3f} ms)")

    # D: shift-add epilogue cost at the real (B, M) lattice size
    M = 32 ** 4 + 2048
    v16 = [jnp.asarray(rng.standard_normal((B, M)).astype(np.float32)) for _ in range(4)]

    def shift_add(a, b, c, d):
        out = a
        out = out + jnp.roll(b, 1, axis=1)
        out = out + jnp.roll(c, 32, axis=1)
        out = out + jnp.roll(d, 33, axis=1)
        return out

    t5 = timed(shift_add, tuple(v16))  # out matches last arg shape
    print(f"D: 3 shifted adds on (B={B}, M={M}): {t5*1e3:.3f} ms")


if __name__ == "__main__":
    main()
