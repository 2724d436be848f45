"""Round-2 experiment (d): multi-factor-per-pass kernels without relayouts.

X1 pass-A: fuse factors 1+2 on blocks (32, 32, BL) — two dots + sublane swap.
X2 tail2 via lane-slice + scalar-FMA (no relayout): block (BB, 1024).
X3 tail2 via lane-slice matmuls both stages.
X4 einsum one-shot 'pab,ca,db->pcd'.
Correctness asserted against XLA reference on-device.  Run on the TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timed_loop

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
K1 = jnp.asarray(rng.standard_normal((MD, MD)) / 8, dtype=jnp.float32)
K2 = jnp.asarray(rng.standard_normal((MD, MD)) / 8, dtype=jnp.float32)
v = jnp.asarray(rng.standard_normal((M,)), dtype=jnp.float32)
HI = lax.Precision.HIGHEST


def bench(name, fn, init, ref=None, words=2 * M):
    try:
        t0 = time.time()
        out = np.asarray(jax.jit(fn)(init))
        c = time.time() - t0
        err = ""
        if ref is not None:
            e = np.abs(out - ref).max() / np.abs(ref).max()
            err = f"  rel_err={e:.1e}"
        t = _timed_loop(fn, init, iters=30)
        print(f"{name:30s} t={t*1e3:7.3f} ms  bw={words*4/t/1e9:7.1f} GB/s{err}  (c{c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


# ---------- X1: fused leading pair on (32, 32, BL) ----------
def passA(x3, BL, prec=HI):
    a, b, L = x3.shape  # (32, 32, L)

    def kernel(x_ref, k1_ref, k2_ref, o_ref):
        x = x_ref[:]  # (32, 32, BL)
        t = lax.dot_general(k1_ref[:], x, (((1,), (0,)), ((), ())),
                            preferred_element_type=x.dtype, precision=prec)  # (a1', a2, BL)
        u = lax.dot_general(k2_ref[:], t, (((1,), (1,)), ((), ())),
                            preferred_element_type=x.dtype, precision=prec)  # (a2', a1', BL)
        o_ref[:] = jnp.swapaxes(u, 0, 1)

    return pl.pallas_call(
        kernel,
        grid=(L // BL,),
        in_specs=[
            pl.BlockSpec((a, b, BL), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a, b, BL), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, K1, K2)


x3 = v.reshape(32, 32, M // 1024)
K1n, K2n = np.asarray(K1, np.float64), np.asarray(K2, np.float64)
xn = np.asarray(x3, np.float64)
t = np.tensordot(K1n, xn, axes=([1], [0]))          # (a1', a2, L)
refA = np.tensordot(K2n, t, axes=([1], [1]))        # (a2', a1', L)
refA = np.swapaxes(refA, 0, 1)                      # (a1', a2', L)
import os
CASE = os.environ.get("CASE", "")
if CASE in ("", "passA1024"):
    bench("passA 2-factor BL=1024", lambda x: passA(x, 1024), x3, ref=refA)
if CASE in ("", "passA2048"):
    bench("passA 2-factor BL=2048", lambda x: passA(x, 2048), x3, ref=refA)

# ---------- X2/X3: tail2 on (BB, 1024) with static lane slices ----------
x2 = v.reshape(M // 1024, 1024)
x2n = np.asarray(x2, np.float64).reshape(-1, 32, 32)
t2 = np.tensordot(x2n, K1n, axes=([1], [1]))        # (p, b, c) = sum_a x[p,a,b] K1[c,a]
ref2 = np.tensordot(t2, K2n, axes=([1], [1]))       # (p, c, d)
ref2 = ref2.reshape(-1, 1024)


def tail2_sliced(x2, BB, prec=HI, order="mxu_first"):
    N, S = x2.shape  # S = 1024 = (a4, a5)

    def kernel(x_ref, k4_ref, k5_ref, o_ref):
        x = x_ref[:]  # (BB, 1024)
        k4 = k4_ref[:]
        k5 = k5_ref[:]
        if order == "mxu_first":
            # stage 1 (MXU): per a4-slice i, y_i = x[:, i] @ K5^T  (BB,32)
            ys = [
                lax.dot_general(x[:, 32 * i : 32 * (i + 1)], k5,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=x.dtype, precision=prec)
                for i in range(32)
            ]
            # stage 2 (VPU): out[:, j] = sum_i K4[j, i] * y_i
            for j in range(32):
                acc = k4[j, 0] * ys[0]
                for i in range(1, 32):
                    acc = acc + k4[j, i] * ys[i]
                o_ref[:, 32 * j : 32 * (j + 1)] = acc
        else:
            # stage 1 (VPU): z_j = sum_i K4[j, i] * x[:, i-slice]
            zs = []
            for j in range(32):
                acc = k4[j, 0] * x[:, 0:32]
                for i in range(1, 32):
                    acc = acc + k4[j, i] * x[:, 32 * i : 32 * (i + 1)]
                zs.append(acc)
            # stage 2 (MXU): out[:, j-slice] = z_j @ K5^T
            for j in range(32):
                o_ref[:, 32 * j : 32 * (j + 1)] = lax.dot_general(
                    zs[j], k5, (((1,), (1,)), ((), ())),
                    preferred_element_type=x.dtype, precision=prec)

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
    )(x2, K1, K2)


if CASE in ("", "sl256"):
    bench("tail2 sliced mxu1 BB=256", lambda x: tail2_sliced(x, 256, order="mxu_first"), x2, ref=ref2)
if CASE in ("", "sl1024"):
    bench("tail2 sliced mxu1 BB=1024", lambda x: tail2_sliced(x, 1024, order="mxu_first"), x2, ref=ref2)
if CASE in ("", "slv"):
    bench("tail2 sliced vpu1 BB=1024", lambda x: tail2_sliced(x, 1024, order="vpu_first"), x2, ref=ref2)


# ---------- X4: einsum one-shot on (BB, 32, 32) ----------
def tail2_einsum(x3, BB, prec=HI):
    N, a, b = x3.shape

    def kernel(x_ref, k4_ref, k5_ref, o_ref):
        o_ref[:] = jnp.einsum(
            "pab,ca,db->pcd", x_ref[:], k4_ref[:], k5_ref[:],
            preferred_element_type=x_ref.dtype, precision=prec)

    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec((BB, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, K1, K2)


x3t = v.reshape(M // 1024, 32, 32)
if CASE in ("", "einsum"):
    bench("tail2 einsum BB=128", lambda x: tail2_einsum(x, 128), x3t,
          ref=ref2.reshape(-1, 32, 32))
