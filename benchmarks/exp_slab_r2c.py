"""Round-2 experiment (c): tune the per-pass kernels toward 540 GB/s.

E1 mid-widened variants (BL sweep, 2D vs 3D, dimension_semantics, vmem limit)
E2 lane-32 borrow-left pass (factor d-1)
E3 tail formulations
Run on the TPU.
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
K = jnp.asarray(rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)), dtype=jnp.float32)
v = jnp.asarray(rng.standard_normal((M,)), dtype=jnp.float32)
HI = lax.Precision.HIGHEST
PAR = pltpu.GridDimensionSemantics.PARALLEL if hasattr(pltpu.GridDimensionSemantics, "PARALLEL") else "parallel"


def bench(name, fn, init, words=2 * M):
    try:
        t0 = time.time()
        jax.block_until_ready(jax.jit(fn)(init))
        c = time.time() - t0
        t = _timed_loop(fn, init, iters=30)
        print(f"{name:34s} t={t*1e3:7.3f} ms  bw={words*4/t/1e9:7.1f} GB/s  (c{c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


W128 = jnp.kron(K, jnp.eye(4, dtype=jnp.float32))  # K (x) I_4


def mid3d(x3, BL, sem=None, prec=HI):
    pre, mkG, L = x3.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=prec,
        )

    kw = {}
    if sem is not None:
        kw["compiler_params"] = pltpu.CompilerParams(dimension_semantics=sem)
    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        **kw,
    )(x3, W128)


def mid2d(x2, pre, BL, prec=HI):
    """Global (pre*128, L) as 2D; block (128, BL) at block-index (i, j)."""
    PL, L = x2.shape

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = lax.dot_general(
            w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=prec,
        )

    return pl.pallas_call(
        kernel,
        grid=(PL // 128, L // BL),
        in_specs=[
            pl.BlockSpec((128, BL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, BL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(x2, W128)


# E1: mid pass for factor 1 (pre=1): global (1, 128, 262144)
x3a = v.reshape(1, 128, M // 128)
for BL in (512, 1024, 2048, 4096, 8192):
    bench(f"mid3d pre1 BL={BL}", lambda x, b=BL: mid3d(x, b), x3a)
bench("mid3d pre1 BL=2048 par", lambda x: mid3d(x, 2048, sem=(PAR, PAR)), x3a)
x2a = v.reshape(128, M // 128)
for BL in (2048, 4096, 8192):
    bench(f"mid2d pre1 BL={BL}", lambda x, b=BL: mid2d(x, 1, b), x2a)

# factor 3 shape: pre=1024, L=256
x3c = v.reshape(1024, 128, 256)
bench("mid3d pre1024 BL=256", lambda x: mid3d(x, 256), x3c)
bench("mid3d pre1024 BL=256 par", lambda x: mid3d(x, 256, sem=(PAR, PAR)), x3c)
x2c = v.reshape(1024 * 128, 256)
bench("mid2d pre1024 BL=256", lambda x: mid2d(x, 1024, 256), x2c)

# E2: lane-32 borrow-left pass (factor 4): global (8192, 128, 32), W = I_4 (x) K
WL = jnp.kron(jnp.eye(4, dtype=jnp.float32), K)


def left32(x3, BB=8, prec=HI):
    pre, mkG, L = x3.shape  # (8192, 128, 32)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = lax.dot_general(
            w_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=prec,
        ).swapaxes(0, 1) if False else jnp.einsum(
            "nm,pms->pns", w_ref[:], x_ref[:], precision=prec,
            preferred_element_type=x_ref.dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=(pre // BB,),
        in_specs=[
            pl.BlockSpec((BB, mkG, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, mkG, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, WL)


x3d = v.reshape(8192, 128, 32)
for BB in (8, 32, 64):
    bench(f"left32 einsum BB={BB}", lambda x, b=BB: left32(x, b), x3d)


# E3a: tail2 as 3D dot chain, large BB: (N, 32, 32) blocks (BB, 32, 32)
def tail2(x3, BB, prec=HI):
    N, m4, m5 = x3.shape

    def kernel(x_ref, k4_ref, k5_ref, o_ref):
        t = lax.dot_general(x_ref[:], k4_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=x_ref.dtype, precision=prec)
        t = lax.dot_general(t, k5_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=x_ref.dtype, precision=prec)
        o_ref[:] = t

    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec((BB, m4, m5), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, m4, m5), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, K, K)


x3e = v.reshape(M // 1024, 32, 32)
for BB in (32, 128, 512):
    bench(f"tail2 chain BB={BB}", lambda x, b=BB: tail2(x, b), x3e)
