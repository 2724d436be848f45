"""Round-2 experiment (e): vmem_limit block scaling + roll-based factor pass.

CASE env var selects one case (run each in its own process; remote compiles
can hang).  Cases: mid_v<MB>_<BL>, slab_v<MB>_<BP>, roll4_<BB>.
"""

import os
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
from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
K = jnp.asarray(rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)), dtype=jnp.float32)
v = jnp.asarray(rng.standard_normal((M,)), dtype=jnp.float32)
HI = lax.Precision.HIGHEST
W128 = jnp.kron(K, jnp.eye(4, dtype=jnp.float32))


def bench(name, fn, init, ref=None, words=2 * M):
    t0 = time.time()
    out = np.asarray(jax.jit(fn)(init))
    c = time.time() - t0
    err = ""
    if ref is not None:
        e = np.abs(out - ref).max() / np.abs(ref).max()
        err = f"  rel_err={e:.1e}"
    t = _timed_loop(fn, init, iters=30)
    print(f"{name:26s} t={t*1e3:7.3f} ms  bw={words*4/t/1e9:7.1f} GB/s{err}", flush=True)


def mid3d_v(x3, BL, vmem_mb):
    pre, mkG, L = x3.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=HI)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x3, W128)


def slab_v(x2, BP, vmem_mb):
    N, S = x2.shape
    W = jnp.kron(jnp.eye(4, dtype=jnp.float32), K)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=HI)

    return pl.pallas_call(
        kernel,
        grid=(N // BP,),
        in_specs=[
            pl.BlockSpec((BP, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x2, W)


def roll4(x2, BB, vmem_mb=32):
    """Contract the a4 axis of lane=(a4,a5) via 32 lane-rolls x weight tables."""
    N, S = x2.shape  # S = 1024
    # Wtab[delta, a4p*32+a5] = K4[a4p, (a4p+delta) % 32]
    a4p = np.arange(32)
    Wt = np.empty((32, 1024), np.float32)
    Kn = np.asarray(K)
    for delta in range(32):
        Wt[delta] = np.repeat(Kn[a4p, (a4p + delta) % 32], 32)
    Wt = jnp.asarray(Wt)

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]  # (BB, 1024)
        acc = w_ref[0][None, :] * x
        for delta in range(1, 32):
            acc = acc + w_ref[delta][None, :] * pltpu.roll(x, (1024 - delta * 32) % 1024, axis=1)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec((BB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x2, Wt)


def mid_full(x3, vmem_mb=48):
    pre, mkG, L = x3.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=HI)

    return pl.pallas_call(
        kernel,
        grid=(pre,),
        in_specs=[
            pl.BlockSpec((1, mkG, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x3, W128)


def mid_batched(x3, P, BL, vmem_mb=40):
    pre, mkG, L = x3.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.einsum(
            "nm,pml->pnl", w_ref[:], x_ref[:],
            preferred_element_type=x_ref.dtype, precision=HI)

    return pl.pallas_call(
        kernel,
        grid=(pre // P, L // BL),
        in_specs=[
            pl.BlockSpec((P, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x3, W128)


CASE = os.environ["CASE"]
if CASE == "mid2full":
    x3 = v.reshape(32, 128, 8192)
    bench(CASE, lambda x: mid_full(x), x3)
elif CASE.startswith("mid3b_"):
    P = int(CASE.split("_")[1])
    x3 = v.reshape(1024, 128, 256)
    bench(CASE, lambda x: mid_batched(x, P, 256), x3)
elif CASE.startswith("mid_"):
    _, vm, bl = CASE.split("_")
    x3 = v.reshape(1, 128, M // 128)
    bench(CASE, lambda x: mid3d_v(x, int(bl), int(vm[1:])), x3)
elif CASE.startswith("slab_"):
    _, vm, bp = CASE.split("_")
    x2 = v.reshape(M // 128, 128)
    bench(CASE, lambda x: slab_v(x, int(bp), int(vm[1:])), x2)
elif CASE.startswith("roll4_"):
    BB = int(CASE.split("_")[1])
    x2 = v.reshape(M // 1024, 1024)
    xn = np.asarray(x2, np.float64).reshape(-1, 32, 32)
    ref = np.tensordot(xn, np.asarray(K, np.float64), axes=([1], [1]))  # (p, a5, a4')
    ref = np.swapaxes(ref, 1, 2).reshape(-1, 1024)
    bench(CASE, lambda x: roll4(x, BB), x2, ref=ref)
def rot5(x2, BL, vmem_mb=32, wide=False):
    """Rotating narrow pass: (32, R) -> (R, 32): out = (K @ x)^T.
    In-kernel transpose; out lane = 32 (padded).  wide=True: widened variant
    (128, R/4) -> (R/4, 128) with W = K (x) I_4 ... wait layout; keep simple."""
    mk, R = x2.shape

    def kernel(x_ref, k_ref, o_ref):
        t = lax.dot_general(k_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=x_ref.dtype, precision=HI)
        o_ref[:] = t.T

    return pl.pallas_call(
        kernel,
        grid=(R // BL,),
        in_specs=[
            pl.BlockSpec((mk, BL), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BL, mk), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, mk), x2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x2, K)


if CASE.startswith("rot5_"):
    BL = int(CASE.split("_")[1])
    x2 = v.reshape(32, M // 32)
    ref = (np.asarray(K, np.float64) @ np.asarray(x2, np.float64)).T
    bench(CASE, lambda x: rot5(x, BL), x2, ref=ref)
elif CASE.startswith("roll4b_"):
    BB = int(CASE.split("_")[1])
    x2 = v.reshape(M // 1024, 1024)
    xn = np.asarray(x2, np.float64).reshape(-1, 32, 32)
    ref = np.tensordot(xn, np.asarray(K, np.float64), axes=([1], [1]))
    ref = np.swapaxes(ref, 1, 2).reshape(-1, 1024)
    bench(CASE, lambda x: roll4(x, BB, vmem_mb=64), x2, ref=ref)

if CASE.split("_")[0] not in ("mid2full", "mid3b", "mid", "slab", "roll4", "rot5", "roll4b"):
    raise SystemExit(f"unknown CASE {CASE}")
