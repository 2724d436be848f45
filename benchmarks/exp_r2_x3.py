"""Manual split-precision (bf16 hi/lo, f32 accumulate) Pallas passes.

Motivation (measured this round): Mosaic's HIGHEST f32 lowering compiles in
5 min and runs the widened mid pass at 321 GB/s; native bf16 dots compile in
seconds and DMA at full rate.  X3 = W_hi@x_hi + W_hi@x_lo + W_lo@x_hi gives
~2e-5 rel err at 3x bf16 MXU cost (still << bandwidth at 128-wide).

Cases (CASE env): midx3_i<k>  — widened mid pass for factor k, X3 in kernel
                  pairx3_<BB> — 1024-wide lane pass W=K4(x)K5, X3
                  pairdef_<BB> — same, plain bf16 (accuracy/bw reference)
                  middef_i<k> — widened mid pass, plain bf16
"""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timed_loop

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
factors_np = [rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)) for _ in range(D)]
factors = tuple(jnp.asarray(K, dtype=jnp.float32) for K in factors_np)
v_np = rng.standard_normal((M,))
v = jnp.asarray(v_np, dtype=jnp.float32)


def split_bf16(W):
    hi = W.astype(jnp.bfloat16)
    lo = (W - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def bench(name, fn, init, ref_arr=None, words=2 * M):
    try:
        t0 = time.time()
        out = np.asarray(jax.jit(fn)(init))
        c = time.time() - t0
        err = ""
        if ref_arr is not None:
            e = np.abs(out.reshape(-1) - ref_arr.reshape(-1)).max() / np.abs(ref_arr).max()
            err = f"  rel_err={e:.1e}"
        t = _timed_loop(fn, init, iters=30)
        print(f"{name:16s} t={t*1e3:7.3f} ms  bw={words*4/t/1e9:7.1f} GB/s{err}  (c{c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:16s} FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)


def mid_x3(x3, K, G, BL=2048, x3_mode=True):
    """(pre, mk*G, L): contract middle with K(x)I_G via bf16 hi/lo dots."""
    pre, mkG, L = x3.shape
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype))
    Wh, Wl = split_bf16(W)
    BL = min(BL, L)
    while L % BL:
        BL //= 2

    def kernel(x_ref, wh_ref, wl_ref, o_ref):
        x = x_ref[0]  # (mkG, BL) f32
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = lax.dot_general(wh_ref[:], xh, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        acc += lax.dot_general(wh_ref[:], xl, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        if x3_mode:
            acc += lax.dot_general(wl_ref[:], xh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        o_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x3, Wh, Wl)


def mid_def(x3, K, G, BL=2048):
    pre, mkG, L = x3.shape
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype))
    BL = min(BL, L)
    while L % BL:
        BL //= 2

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x3, W)


def pair_pass(x2, W, BB, mode):
    """(N, S) lane pass: out = x @ W^T, W (S, S)."""
    N, S = x2.shape
    Wh, Wl = split_bf16(W)

    if mode == "def":
        def kernel(x_ref, wh_ref, wl_ref, o_ref):
            o_ref[:] = lax.dot_general(
                x_ref[:], wh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        def kernel(x_ref, wh_ref, wl_ref, o_ref):
            x = x_ref[:]
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = lax.dot_general(xh, wh_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            acc += lax.dot_general(xl, wh_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            acc += lax.dot_general(xh, wl_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec((BB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x2, Wh, Wl)


CASE = os.environ["CASE"]
G = 128 // MD

if CASE.startswith("midx3_i") or CASE.startswith("middef_i"):
    i = int(CASE.split("_i")[1])
    pre = MD**i
    post = M // pre // MD
    x3 = v.reshape(pre, MD * G, post // G)
    # f64 oracle for this single pass
    xl = v_np.reshape(pre, MD, G, post // G)
    ref = np.einsum("ok,pkgl->pogl", np.asarray(factors_np[i]), xl).reshape(x3.shape)
    if CASE.startswith("midx3"):
        bench(CASE, lambda xx: mid_x3(xx, factors[i], G), x3, ref_arr=ref, words=2 * M)
    else:
        bench(CASE, lambda xx: mid_def(xx, factors[i], G), x3, ref_arr=ref, words=2 * M)
elif CASE.startswith("pairx3_") or CASE.startswith("pairdef_"):
    BB = int(CASE.split("_")[1])
    mode = "x3" if "x3" in CASE else "def"
    S = MD * MD
    W = jnp.kron(factors[3], factors[4])
    x2 = v.reshape(M // S, S)
    xn = v_np.reshape(-1, MD, MD)
    t = np.einsum("nab,xa->nxb", xn, np.asarray(factors_np[3]))
    t = np.einsum("nxb,yb->nxy", t, np.asarray(factors_np[4]))
    bench(CASE, lambda xx: pair_pass(xx, W, BB, mode), x2, ref_arr=t, words=2 * M)
else:
    raise SystemExit(f"unknown CASE {CASE}")
