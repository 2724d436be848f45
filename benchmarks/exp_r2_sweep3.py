"""Sweep 3: stacked-X3 dots, dimension-semantics, 2-pass schedule blocks.

Per-pass ceiling today is ~325 GB/s (= read/write DMA not overlapping: 2 x
134 MB at 587 GB/s = 0.46 ms each way -> 0.83 ms observed everywhere).
The lever is PASS COUNT: a 2-pass schedule scores 5/2 x per-pass bw on the
2*d*m effective model.

X3 as ONE dot: out = [Wh Wh Wl] @ [xh; xl; xh] — the f32 accumulate happens
inside a single MXU op, so Mosaic cannot drop the low-order contributions
(observed: separate f32 adds of bf16 dots lose them in W-on-left kernels).

Cases:
  midsem_i1    — mid def + dimension_semantics=("parallel","parallel")
  midcat_i1    — mid with stacked-X3 single dot (accuracy probe)
  dm23_<BL>    — double-mid: contract (m2,m3) with W=K2(x)K3, 1024-wide, X3
  p1fused_<BL> — P1: mid(m1 widened) + (m4,m5) pair, both stacked-X3
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
G = 128 // MD
rng = np.random.default_rng(0)
factors_np = [rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)) for _ in range(D)]
factors = tuple(jnp.asarray(K, dtype=jnp.float32) for K in factors_np)
v_np = rng.standard_normal((M,))
v = jnp.asarray(v_np, dtype=jnp.float32)
VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
VMEM_PAR = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024,
    dimension_semantics=("parallel", "parallel"),
)


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


def wcat_x3(W):
    """[Wh | Wh | Wl] along the contraction axis (axis 1), bf16."""
    Wh = W.astype(jnp.bfloat16)
    Wl = (W - Wh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([Wh, Wh, Wl], axis=1)  # (out, 3*in)


def _mask_split(x):
    xb = pltpu.bitcast(x, jnp.uint32)
    xh32 = pltpu.bitcast(xb & jnp.uint32(0xFFFF0000), jnp.float32)
    xh = xh32.astype(jnp.bfloat16)
    xl = (x - xh32).astype(jnp.bfloat16)
    return xh, xl


def _xcat(x):
    """[xh; xl; xh] along the sublane (contraction) axis."""
    xh, xl = _mask_split(x)
    return jnp.concatenate([xh, xl, xh], axis=0)


def mid_sem(x3, K, BL):
    pre, mkG, L = x3.shape
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype)).astype(jnp.bfloat16)
    BL = min(BL, L)
    while L % BL:
        BL //= 2

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
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
        compiler_params=VMEM_PAR,
    )(x3, W)


def mid_cat(x3, K, BL):
    pre, mkG, L = x3.shape
    Wc = wcat_x3(jnp.kron(K, jnp.eye(G, dtype=K.dtype)))  # (128, 384)
    BL = min(BL, L)
    while L % BL:
        BL //= 2

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], _xcat(x_ref[0]), (((1,), (0,)), ((), ())),
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
        compiler_params=VMEM,
    )(x3, Wc)


def double_mid(x3, W23, BL):
    """x view (m1, 1024, 1024): contract the middle (m2, m3) with W23."""
    pre, mk, L = x3.shape
    Wc = wcat_x3(W23)  # (1024, 3072)
    BL = min(BL, L)
    while L % BL:
        BL //= 2

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], _xcat(x_ref[0]), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mk, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mk, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=VMEM,
    )(x3, Wc)


def p1_fused(x3, K1, WpT, BL):
    """P1: widened mid for m1 + (m4, m5) lane pair, stacked-X3 both."""
    pre, mkG, L = x3.shape  # (1, 128, 262144)
    Wc = wcat_x3(jnp.kron(K1, jnp.eye(G, dtype=K1.dtype)))  # (128, 384)
    # pair: out_chunk = t_chunk @ WpT -> stacked form [th; tl; th] needs the
    # CONTRACTION on t's lane axis; instead pass Wp^T stacked on ITS sublane:
    # out = tcat_lanes? Lane-axis concat of t is forbidden (lane reshape) —
    # use x-first orientation: out = dot(tc_cat (BLOCKrows? ...
    # tc (128, 1024): contraction over lanes with WpT (1024, 1024):
    # dot_general(tc, WpTcat3) needs tc split stacked along ITS lane axis ->
    # forbidden.  Instead: THREE dots with f32 adds — x-first orientation
    # preserved accuracy in round-1 of this sweep family (pairx3: 5.4e-6).
    Wp_h = WpT.astype(jnp.bfloat16)
    Wp_l = (WpT - Wp_h.astype(jnp.float32)).astype(jnp.bfloat16)
    BL = min(BL, L)
    while L % BL:
        BL //= 2
    n_chunks = BL // 1024

    def kernel(x_ref, w_ref, ph_ref, pl_ref, o_ref):
        t = lax.dot_general(
            w_ref[:], _xcat(x_ref[0]), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (128, BL) f32
        for c in range(n_chunks):
            tc = t[:, 1024 * c:1024 * (c + 1)]
            th, tl = _mask_split(tc)
            acc = lax.dot_general(th, ph_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            acc += lax.dot_general(tl, ph_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            acc += lax.dot_general(th, pl_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            o_ref[0, :, 1024 * c:1024 * (c + 1)] = acc

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=VMEM,
    )(x3, Wc, Wp_h, Wp_l)


CASE = os.environ["CASE"]

if CASE == "midsem_i1":
    i = 1
    pre, post = MD**i, M // MD ** (i + 1)
    x3 = v.reshape(pre, MD * G, post // G)
    xl_ = v_np.reshape(pre, MD, G, post // G)
    ref = np.einsum("ok,pkgl->pogl", np.asarray(factors_np[i]), xl_).reshape(x3.shape)
    bench(CASE, lambda xx: mid_sem(xx, factors[i], 8192), x3, ref_arr=ref, words=2 * M)
elif CASE == "midcat_i1":
    i = 1
    pre, post = MD**i, M // MD ** (i + 1)
    x3 = v.reshape(pre, MD * G, post // G)
    xl_ = v_np.reshape(pre, MD, G, post // G)
    ref = np.einsum("ok,pkgl->pogl", np.asarray(factors_np[i]), xl_).reshape(x3.shape)
    bench(CASE, lambda xx: mid_cat(xx, factors[i], 8192), x3, ref_arr=ref, words=2 * M)
elif CASE.startswith("dm23_"):
    BL = int(CASE.split("_")[1])
    x3 = v.reshape(MD, MD * MD, MD * MD)
    W23 = jnp.kron(factors[1], factors[2])
    xn = v_np.reshape(MD, MD, MD, MD, MD)
    t = np.einsum("abcde,ob->aocde", xn, np.asarray(factors_np[1]))
    t = np.einsum("abcde,oc->abode", t, np.asarray(factors_np[2]))
    ref = t.reshape(x3.shape)
    bench(CASE, lambda xx: double_mid(xx, W23, BL), x3, ref_arr=ref, words=2 * M)
elif CASE.startswith("p1fused_"):
    BL = int(CASE.split("_")[1])
    x3 = v.reshape(1, MD * G, M // 128)
    Wp = jnp.kron(factors[3], factors[4])
    xn = v_np.reshape(MD, MD, MD, MD, MD)
    t = np.einsum("abcde,oa->obcde", xn, np.asarray(factors_np[0]))
    t = np.einsum("abcde,xd->abcxe", t, np.asarray(factors_np[3]))
    t = np.einsum("abcde,ye->abcdy", t, np.asarray(factors_np[4]))
    ref = t.reshape(x3.shape)
    bench(CASE, lambda xx: p1_fused(xx, factors[0], Wp.T, BL), x3, ref_arr=ref, words=2 * M)
else:
    raise SystemExit(f"unknown CASE {CASE}")
