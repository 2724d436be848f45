"""Sweep 2: DMA contiguity + dot orientation + bitmask X3 split.

Findings so far (today's chip, stream=587):
  mid pass (1,128,BL=2048) strided 8KB chunks: 320-330 GB/s, any precision
  pair lane pass S=1024 x@W^T orientation:     263 GB/s (compute/transpose?)
  Mosaic folds astype-based hi/lo split -> xl==0 (bf16-grade error)

Cases:
  slab128      — last_slab structure S=128 W=I4(x)K5 bf16 (r1 calibration: 540)
  slab128_x3m  — same with bitmask X3 split (accuracy + cost of 3 dots)
  midfull_i1   — mid pass, full-plane contiguous blocks (1,128,8192), bf16
  midfullx3_i1 — same, bitmask X3
  mid_i0_b16k  — i0 strided with BL=16384 (64KB chunks), bf16
  pairT_512    — S=1024 lane pass, W^T passed in, ((1,),(0,)) orientation, bf16
  pairTx3_512  — same, bitmask X3
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


def split_w(W):
    hi = W.astype(jnp.bfloat16)
    lo = (W - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mask_split(x):
    """Truncation split via bit masking — Mosaic cannot fold this away.
    xh = top-16-bits of x (exactly bf16-representable), xl = x - xh."""
    xb = pltpu.bitcast(x, jnp.uint32)
    xh32 = pltpu.bitcast(xb & jnp.uint32(0xFFFF0000), jnp.float32)
    xh = xh32.astype(jnp.bfloat16)
    xl = (x - xh32).astype(jnp.bfloat16)
    return xh, xl


def lane_pass(x2, WT, BB, mode):
    """(N, S) -> (N, S'): out = x @ WT with natural ((1,),(0,)) orientation.
    WT is the (S, S') *already transposed* weight."""
    N, S = x2.shape
    So = WT.shape[1]
    Wh, Wl = split_w(WT)

    if mode == "def":
        def kernel(x_ref, wh_ref, wl_ref, o_ref):
            o_ref[:] = lax.dot_general(
                x_ref[:], wh_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        def kernel(x_ref, wh_ref, wl_ref, o_ref):
            xh, xl = _mask_split(x_ref[:])
            acc = lax.dot_general(xh, wh_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            acc += lax.dot_general(xl, wh_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            acc += lax.dot_general(xh, wl_ref[:], (((1,), (0,)), ((), ())),
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
        out_specs=pl.BlockSpec((BB, So), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, So), x2.dtype),
        compiler_params=VMEM,
    )(x2, Wh, Wl)


def mid_pass(x3, K, BL, mode):
    pre, mkG, L = x3.shape
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype))
    Wh, Wl = split_w(W)
    BL = min(BL, L)
    while L % BL:
        BL //= 2

    if mode == "def":
        def kernel(x_ref, wh_ref, wl_ref, o_ref):
            o_ref[0] = lax.dot_general(
                wh_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        def kernel(x_ref, wh_ref, wl_ref, o_ref):
            xh, xl = _mask_split(x_ref[0])
            acc = lax.dot_general(wh_ref[:], xh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            acc += lax.dot_general(wh_ref[:], xl, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
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
        compiler_params=VMEM,
    )(x3, Wh, Wl)


CASE = os.environ["CASE"]

if CASE.startswith("slab128"):
    # contract m5 with W = I_G (x) K5 on the trailing 128 slab
    mode = "x3m" if "x3m" in CASE else "def"
    W = jnp.kron(jnp.eye(G, dtype=jnp.float32), factors[4])  # (128, 128)
    x2 = v.reshape(M // 128, 128)
    xn = v_np.reshape(-1, G, MD)
    ref = np.einsum("ngb,yb->ngy", xn, np.asarray(factors_np[4])).reshape(-1, 128)
    bench(CASE, lambda xx: lane_pass(xx, jnp.asarray(W).T, 2048, mode), x2,
          ref_arr=ref, words=2 * M)
elif CASE.startswith("midfull"):
    i = 1
    mode = "x3" in CASE and "x3m" or "def"
    pre = MD**i
    post = M // pre // MD
    x3 = v.reshape(pre, MD * G, post // G)  # (32, 128, 8192)
    xl_ = v_np.reshape(pre, MD, G, post // G)
    ref = np.einsum("ok,pkgl->pogl", np.asarray(factors_np[i]), xl_).reshape(x3.shape)
    bench(CASE, lambda xx: mid_pass(xx, factors[i], 8192, mode), x3,
          ref_arr=ref, words=2 * M)
elif CASE.startswith("mid_i0_b16k"):
    x3 = v.reshape(1, MD * G, M // 128)
    xl_ = v_np.reshape(1, MD, G, M // 128)
    ref = np.einsum("ok,pkgl->pogl", np.asarray(factors_np[0]), xl_).reshape(x3.shape)
    bench(CASE, lambda xx: mid_pass(xx, factors[0], 16384, "def"), x3,
          ref_arr=ref, words=2 * M)
elif CASE.startswith("pairT"):
    BB = int(CASE.split("_")[1])
    mode = "x3m" if "x3" in CASE else "def"
    S = MD * MD
    W = jnp.kron(factors[3], factors[4])
    x2 = v.reshape(M // S, S)
    xn = v_np.reshape(-1, MD, MD)
    t = np.einsum("nab,xa->nxb", xn, np.asarray(factors_np[3]))
    t = np.einsum("nxb,yb->nxy", t, np.asarray(factors_np[4]))
    bench(CASE, lambda xx: lane_pass(xx, W.T, BB, mode), x2, ref_arr=t, words=2 * M)


def fused_mid_pair(x3, K_mid, WpT, BL, mode="x3m"):
    """P2 kernel: contract the middle axis with K_mid (x) I_G AND the trailing
    (m4, m5) lane pairs with Wp (1024-wide), all in one VMEM visit.
    WpT: (1024, 1024) pre-transposed pair weight."""
    pre, mkG, L = x3.shape
    W = jnp.kron(K_mid, jnp.eye(G, dtype=K_mid.dtype))
    Wh, Wl = split_w(W)
    Ph, Pl = split_w(WpT)
    BL = min(BL, L)
    while L % BL:
        BL //= 2
    n_chunks = BL // 1024

    def kernel(x_ref, wh_ref, wl_ref, ph_ref, pl_ref, o_ref):
        xh, xl = _mask_split(x_ref[0])
        t = lax.dot_general(wh_ref[:], xh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t += lax.dot_general(wh_ref[:], xl, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        if mode == "x3m":
            t += lax.dot_general(wl_ref[:], xh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        for c in range(n_chunks):
            tc = t[:, 1024 * c:1024 * (c + 1)]
            th, tl = _mask_split(tc)
            acc = lax.dot_general(th, ph_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            acc += lax.dot_general(tl, ph_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            if mode == "x3m":
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=VMEM,
    )(x3, Wh, Wl, Ph, Pl)


if CASE.startswith("fusedP2"):
    # factor 1 mid + (m4, m5) pair fused; BL from case suffix
    BL = int(CASE.split("_")[-1]) if CASE.split("_")[-1].isdigit() else 8192
    i = 1
    pre = MD**i
    post = M // pre // MD
    x3 = v.reshape(pre, MD * G, post // G)  # (32, 128, 8192)
    Wp = jnp.kron(factors[3], factors[4])
    # oracle: apply K1 to axis 1 and the pair to axes 3,4 of the lattice
    xn = v_np.reshape(MD, MD, MD, MD, MD)
    t = np.einsum("abcde,ob->aocde", xn, np.asarray(factors_np[1]))
    t = np.einsum("abcde,xd->abcxe", t, np.asarray(factors_np[3]))
    t = np.einsum("abcde,ye->abcdy", t, np.asarray(factors_np[4]))
    ref = t.reshape(x3.shape)
    bench(CASE, lambda xx: fused_mid_pair(xx, factors[i], Wp.T, BL), x3,
          ref_arr=ref, words=2 * M)
elif CASE == "mid_i2full_x3":
    i = 2
    pre = MD**i
    post = M // pre // MD
    x3 = v.reshape(pre, MD * G, post // G)  # (1024, 128, 256)
    xl_ = v_np.reshape(pre, MD, G, post // G)
    ref = np.einsum("ok,pkgl->pogl", np.asarray(factors_np[i]), xl_).reshape(x3.shape)
    bench(CASE, lambda xx: mid_pass(xx, factors[i], 256, "x3m"), x3,
          ref_arr=ref, words=2 * M)
