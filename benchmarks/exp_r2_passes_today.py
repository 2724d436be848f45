"""Per-pass landscape on today's chip: find the fastest physical-pass
formulation for the 3-pass slab schedule (or a 2-pass variant).

Each candidate processes the full 134 MB lattice once (read+write); 'GB/s'
below is ACTUAL traffic 2*m*4/t, not the algorithmic model.
"""
import json
import sys

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
from gp_grief_tpu.ops.pallas.kron_pallas import (
    _fused_mid_pair_pass,
    _mid_widened_pass,
    _split_bf16,
    last_slab_pass,
)

m_d, d = 32, 5
m = m_d**d
rng = np.random.default_rng(0)
Ks = [jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), jnp.float32) for _ in range(d)]
v = jnp.asarray(rng.standard_normal((m,)), jnp.float32)

results = {}


def t_pass(name, fn, x, n=30):
    t = _timed_loop(fn, x, iters=n)
    gbs = 2 * m * 4 / t / 1e9
    results[name] = {"ms": round(t * 1e3, 3), "actual_GBs": round(gbs, 1)}
    print(name, results[name], flush=True)


# 1. pure copy through pallas blocks (contiguous 2D (N, 128))
def copy_pass(x):
    x2 = x.reshape(-1, 128)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0001

    return pl.pallas_call(
        kernel,
        grid=(x2.shape[0] // 2048,),
        in_specs=[pl.BlockSpec((2048, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2048, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(x2).reshape(-1)


t_pass("copy_2048x128", copy_pass, v)

# 2. last_slab_pass: lane contraction with 128-wide W (= I4 (x) K)
W128 = jnp.kron(jnp.eye(4, dtype=jnp.float32), Ks[-1])
t_pass("slab_lane_128", lambda x: last_slab_pass(x.reshape(-1, 128), W128).reshape(-1), v)

# 3. mid widened, P2 shape (pre=32, 128, 8192), HIGHEST (current code)
t_pass(
    "mid_w_p2_HI",
    lambda x: _mid_widened_pass(
        x.reshape(32, 128, 8192), Ks[1], 4, lax.Precision.HIGHEST, False
    ).reshape(-1),
    v,
)

# 4. mid widened, P3 shape (pre=1024, 128, 256)
t_pass(
    "mid_w_p3_HI",
    lambda x: _mid_widened_pass(
        x.reshape(1024, 128, 256), Ks[2], 4, lax.Precision.HIGHEST, False
    ).reshape(-1),
    v,
)

# 5. mid widened pre=1 (P1 mid only shape)
t_pass(
    "mid_w_p1_HI",
    lambda x: _mid_widened_pass(
        x.reshape(1, 128, 8192 * 32), Ks[0], 4, lax.Precision.HIGHEST, False
    ).reshape(-1),
    v,
)

# 6. multi-pre blocks: (8, 128, BL) with per-row dots unrolled
def mid_multipre(x, K, G=4, PB=8, BL=8192):
    x3 = x.reshape(32, 128, 8192)
    pre, mkG, L = x3.shape
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype))

    def kernel(x_ref, w_ref, o_ref):
        for p in range(PB):
            o_ref[p] = lax.dot_general(
                w_ref[:], x_ref[p], (((1,), (0,)), ((), ())),
                preferred_element_type=x_ref.dtype, precision=lax.Precision.HIGHEST,
            )

    return pl.pallas_call(
        kernel,
        grid=(pre // PB, L // BL),
        in_specs=[
            pl.BlockSpec((PB, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, W).reshape(-1)


t_pass("mid_multipre8_BL8192", lambda x: mid_multipre(x, Ks[1], PB=8, BL=8192), v)
t_pass("mid_multipre4_BL8192", lambda x: mid_multipre(x, Ks[1], PB=4, BL=8192), v)

# 7. P1 fused alone, DEFAULT and X3
Wp = jnp.kron(Ks[-2], Ks[-1])
t_pass(
    "p1_fused_DEF",
    lambda x: _fused_mid_pair_pass(
        x.reshape(1, 128, 262144), Ks[0], 4, Wp, 1024, lax.Precision.DEFAULT, False
    ).reshape(-1),
    v,
)
t_pass(
    "p1_fused_X3",
    lambda x: _fused_mid_pair_pass(
        x.reshape(1, 128, 262144), Ks[0], 4, Wp, 1024, lax.Precision.HIGHEST, False
    ).reshape(-1),
    v,
)

# 8. 1024-wide mid, bf16 single dot (2-pass candidate P_wide at DEFAULT)
def wide_mid_bf16(x, W01, BL=4096):
    x3 = x.reshape(1, 1024, 32768)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=lax.Precision.DEFAULT,
        )

    return pl.pallas_call(
        kernel,
        grid=(1, 32768 // BL),
        in_specs=[
            pl.BlockSpec((1, 1024, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1024, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, W01).reshape(-1)


W01 = jnp.kron(Ks[0], Ks[1])
t_pass("wide1024_mid_bf16", lambda x: wide_mid_bf16(x, W01), v)

# 9. lane-pair alone (no fused mid): x2 (N,1024) @ Wp^T, bf16 and split
def pair_pass(x, mode):
    x2 = x.reshape(-1, 1024)
    Wh, Wl = _split_bf16(Wp)

    def kernel(x_ref, wh_ref, wl_ref, o_ref):
        t = x_ref[:]
        th = t.astype(jnp.bfloat16)
        acc = lax.dot_general(th, wh_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        if mode == "x3":
            tl = (t - th.astype(jnp.float32)).astype(jnp.bfloat16)
            acc += lax.dot_general(tl, wh_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            acc += lax.dot_general(th, wl_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        o_ref[:] = acc

    BP = 2048
    return pl.pallas_call(
        kernel,
        grid=(x2.shape[0] // BP,),
        in_specs=[
            pl.BlockSpec((BP, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, Wh, Wl).reshape(-1)


t_pass("pair_alone_bf16", lambda x: pair_pass(x, "def"), v)
t_pass("pair_alone_x3", lambda x: pair_pass(x, "x3"), v)

print(json.dumps(results))
