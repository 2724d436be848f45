"""Fix the rotation-free slab schedule: find a tail3 config that compiles at
HIGHEST, and measure each stage + end-to-end.  One CASE per process."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_loop
from gp_grief_tpu.ops.pallas.kron_pallas import (
    kron_matvec_slab,
    _mid_widened_pass,
    _tail2_pass,
    _tail3_pass,
)

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
factors_np = [rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)) for _ in range(D)]
factors = tuple(jnp.asarray(K, dtype=jnp.float32) for K in factors_np)
v_np = rng.standard_normal((M,))
v = jnp.asarray(v_np, dtype=jnp.float32)
HI = lax.Precision.HIGHEST

x = v_np.reshape([MD] * D)
for i, K in enumerate(factors_np):
    x = np.moveaxis(np.tensordot(K, x, axes=([1], [i])), 0, i)
ref = x.reshape(-1)
refmax = np.abs(ref).max()


def bench(name, fn, init, ref_arr=None, words=2 * D * M):
    try:
        t0 = time.time()
        out = np.asarray(jax.jit(fn)(init))
        c = time.time() - t0
        err = ""
        if ref_arr is not None:
            e = np.abs(out.reshape(-1) - ref_arr.reshape(-1)).max() / np.abs(ref_arr).max()
            err = f"  rel_err={e:.1e}"
        t = _timed_loop(fn, init, iters=30)
        print(f"{name:22s} t={t*1e3:7.3f} ms  eff_bw={words*4/t/1e9:7.1f} GB/s{err}  (c{c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


CASE = os.environ["CASE"]

if CASE.startswith("e2e_r"):  # end-to-end slab at HIGHEST
    k = int(CASE[5:])
    bench(CASE, lambda vv: kron_matvec_slab(factors, vv, tail_block_rows=k), v, ref_arr=ref)
elif CASE.startswith("mid_i"):  # single widened mid pass for factor i
    i = int(CASE[5:])
    pre = MD**i
    G = 128 // MD
    post = (M // pre // MD)
    x3 = v.reshape(pre, MD * G, post // G)
    bench(CASE, lambda xx: _mid_widened_pass(xx, factors[i], G, HI, False), x3, words=2 * M)
elif CASE.startswith("tail3_r"):  # tail3 alone, block rows k
    k = int(CASE[7:])
    N = M // MD**3
    x4 = v.reshape(N, MD, MD, MD)
    xn = np.asarray(x4, np.float64)
    t = np.einsum("nabc,xa->nxbc", xn, np.asarray(factors_np[2]))
    t = np.einsum("nxbc,yb->nxyc", t, np.asarray(factors_np[3]))
    t = np.einsum("nxyc,zc->nxyz", t, np.asarray(factors_np[4]))
    bench(
        CASE,
        lambda xx: _tail3_pass(xx, factors[2], factors[3], factors[4], HI, False, block_rows=k),
        x4, ref_arr=t, words=2 * M,
    )
# --- added cases: tail2 (3-D blocks) and precision diagnostics ---
elif CASE.startswith("tail2_"):
    # tail2_<prec>_r<k>: contract (m4, m5) on (N, 32, 32) blocks
    _, prec_s, k_s = CASE.split("_")
    prec = HI if prec_s == "hi" else lax.Precision.DEFAULT
    k = int(k_s[1:])
    N = M // MD**2
    x3 = v.reshape(N, MD, MD)
    xn = np.asarray(x3, np.float64)
    t = np.einsum("nab,xa->nxb", xn, np.asarray(factors_np[3]))
    t = np.einsum("nxb,yb->nxy", t, np.asarray(factors_np[4]))
    bench(
        CASE,
        lambda xx: _tail2_pass(xx, factors[3], factors[4], prec, False, block_rows=k),
        x3, ref_arr=t, words=2 * M,
    )
elif CASE.startswith("t3def_r"):  # tail3 at DEFAULT precision (compile diagnostic)
    k = int(CASE[7:])
    N = M // MD**3
    x4 = v.reshape(N, MD, MD, MD)
    bench(
        CASE,
        lambda xx: _tail3_pass(xx, factors[2], factors[3], factors[4],
                               lax.Precision.DEFAULT, False, block_rows=k),
        x4, words=2 * M,
    )
else:
    raise SystemExit(f"unknown CASE {CASE}")
