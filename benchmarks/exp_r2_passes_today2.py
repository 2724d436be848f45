"""Round 2, experiment C: copy-kernel block-size scaling (DMA overlap probe)
+ the fused/pair/wide-mid pass numbers the first run missed."""
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
from gp_grief_tpu.ops.pallas.kron_pallas import _fused_mid_pair_pass, _split_bf16

m_d, d = 32, 5
m = m_d**d
rng = np.random.default_rng(0)
Ks = [jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), jnp.float32) for _ in range(d)]
v = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
results = {}


def t_pass(name, fn, x, n=30):
    try:
        t = _timed_loop(fn, x, iters=n)
    except Exception as e:  # noqa: BLE001
        print(name, "FAILED:", str(e).split("\n")[0][:120], flush=True)
        return
    gbs = 2 * m * 4 / t / 1e9
    results[name] = {"ms": round(t * 1e3, 3), "actual_GBs": round(gbs, 1)}
    print(name, results[name], flush=True)


def copy_pass(rows, lanes):
    def f(x):
        x2 = x.reshape(-1, lanes)

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0001

        return pl.pallas_call(
            kernel,
            grid=(x2.shape[0] // rows,),
            in_specs=[pl.BlockSpec((rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x2).reshape(-1)

    return f


for rows, lanes in [(4096, 128), (8192, 128), (16384, 128), (2048, 512), (4096, 1024)]:
    t_pass(f"copy_{rows}x{lanes}", copy_pass(rows, lanes), v)

# P1 fused standalone
Wp = jnp.kron(Ks[-2], Ks[-1])
for nm, prec in [("DEF", lax.Precision.DEFAULT), ("X3", lax.Precision.HIGHEST)]:
    t_pass(
        f"p1_fused_{nm}",
        lambda x, p=prec: _fused_mid_pair_pass(
            x.reshape(1, 128, 262144), Ks[0], 4, Wp, 1024, p, False
        ).reshape(-1),
        v,
    )

# pair alone (N, 1024) lane contraction
def pair_pass(mode, BP=2048):
    Wh, Wl = _split_bf16(Wp)

    def f(x):
        x2 = x.reshape(-1, 1024)

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

    return f


t_pass("pair_alone_bf16", pair_pass("def"), v)
t_pass("pair_alone_x3", pair_pass("x3"), v)

# wide 1024 mid (K0 (x) K1), bf16 single dot — 2-pass candidate P2
def wide_mid_bf16(BL):
    W01 = jnp.kron(Ks[0], Ks[1])

    def f(x):
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

    return f


for BL in (2048, 4096):
    t_pass(f"wide1024_mid_bf16_BL{BL}", wide_mid_bf16(BL), v)

print(json.dumps(results))
