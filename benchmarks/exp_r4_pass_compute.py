"""Round-4 experiment: cut the MXU-compute share of the 2-pass slab matvec.

Cost model (measured r2/r3): each Pallas pass = serialized DMA + MXU time.
At the d=5x32 headline (m=33.5M) the 2-pass @ DEFAULT schedule spends
~0.42 ms per 1024-wide bf16 dot (68.7 GFLOP at 164 TF/s) in BOTH passes:

  P1: widened mid (HIGHEST, 128-wide, ~0.26 ms) + trailing PAIR as one
      1024-wide bf16 lane dot (0.42 ms)
  P2: factors 1,2 merged into one 1024-wide bf16 mid dot (0.42 ms)

The pair/merge width is pure bookkeeping: contracting each 32-wide factor
separately costs 16x less compute (4.3 GFLOP total).  Mosaic forbids LANE
reshapes but allows SUBLANE splits and in-VMEM transposes, so:

  * P2 two-dot: view the merged (1024) sublane axis as (32, 32) and chain
    two W-left dot_generals — K2 first then K1 restores canonical order
    with zero transposes.
  * P1 transposed pair: transpose each (128, 1024) lane chunk to
    (1024, 128), sublane-split to (32, 32, 128), two W-left dots,
    transpose back.  Trades 0.42 ms of MXU for 2 in-VMEM transposes.

Variants measured (slope-timed chained loops, real chip):
  A  production 2-pass slab (baseline)
  B  P1 current + P2 two-dot
  C  P1 transposed-pair + P2 merged
  D  P1 transposed-pair + P2 two-dot
  E  D with bf16 input AND bf16 output (the bf16-CG-state operating point)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r4_pass_compute.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timed_loop
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import (
    _largest_divisor,
    _pick_BL,
    _SLAB_VMEM,
    kron_matvec_slab,
)


def p1_pass(x3, K0, G, K3, K4, pair_mode, out_dtype, mid_default=False):
    """(1, m0*G, L) -> (1, m0*G, L): widened mid for K0 + trailing pair.

    pair_mode: 'lane1024' (one S-wide bf16 dot) or 'transpose' (in-VMEM
    transpose + two 32-wide dots).  mid_default: run the widened mid as one
    bf16 dot instead of Mosaic HIGHEST (x6) — per the serialized DMA+MXU
    cost model the x6 emulation adds ~0.2 ms to the pass."""
    pre, m0G, L = x3.shape
    m3, m4 = int(K3.shape[0]), int(K4.shape[0])
    S = m3 * m4
    bf16_in = x3.dtype == jnp.bfloat16
    W0 = jnp.kron(K0, jnp.eye(G, dtype=K0.dtype))
    if bf16_in or mid_default:
        W0 = W0.astype(jnp.bfloat16)
    Wp = jnp.kron(K3, K4).astype(jnp.bfloat16)
    K3b = K3.astype(jnp.bfloat16)
    K4b = K4.astype(jnp.bfloat16)
    itemsize = (x3.dtype.itemsize + jnp.dtype(out_dtype).itemsize) // 2
    BL = _pick_BL(L, 2 * m0G * itemsize // 2)
    if BL % S:
        BL = S * _largest_divisor(L // S, max(1, BL // S))
    n_chunks = BL // S

    def kernel(x_ref, w0_ref, wp_ref, k3_ref, k4_ref, o_ref):
        xin = x_ref[0]
        if mid_default and not bf16_in:
            xin = xin.astype(jnp.bfloat16)
        t = lax.dot_general(
            w0_ref[:], xin, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                lax.Precision.DEFAULT
                if (bf16_in or mid_default)
                else lax.Precision.HIGHEST
            ),
        )  # (m0*G, BL) f32
        for c in range(n_chunks):
            tc = t[:, S * c:S * (c + 1)].astype(jnp.bfloat16)  # (m0G, S)
            if pair_mode == "lane1024":
                acc = lax.dot_general(
                    tc, wp_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:  # transpose
                tt = tc.T.reshape(m3, m4, m0G)  # sublane split after transpose
                tt = lax.dot_general(
                    k4_ref[:], tt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (o4, m3, m0G)
                tt = lax.dot_general(
                    k3_ref[:], tt.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (o3, o4, m0G)
                acc = tt.reshape(S, m0G).T
            o_ref[0, :, S * c:S * (c + 1)] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, m0G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m0G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pre, m0G, L), out_dtype),
        compiler_params=_SLAB_VMEM,
        interpret=False,
    )(x3, W0, Wp, K3b, K4b)


def p2_pass(x_flat, pre, K1, K2, mode, out_dtype):
    """(pre, m1, m2, L): contract m1 and m2.  mode: 'merged' (one 1024-wide
    dot of K1 (x) K2) or 'twodot' (K2 then K1 W-left, canonical order)."""
    m1, m2 = int(K1.shape[0]), int(K2.shape[0])
    L = x_flat.size // (pre * m1 * m2)
    dt = x_flat.dtype
    K1c, K2c = K1.astype(dt), K2.astype(dt)
    W = jnp.kron(K1, K2).astype(dt)
    itemsize = (dt.itemsize + jnp.dtype(out_dtype).itemsize) // 2
    BL = _pick_BL(L, 2 * m1 * m2 * itemsize // 2)

    if mode == "merged":
        x3 = x_flat.reshape(pre, m1 * m2, L)

        def kernel(x_ref, w_ref, o_ref):
            o_ref[0] = lax.dot_general(
                w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(pre, L // BL),
            in_specs=[
                pl.BlockSpec((1, m1 * m2, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, m1 * m2, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((pre, m1 * m2, L), out_dtype),
            compiler_params=_SLAB_VMEM,
        )(x3, W)

    x4 = x_flat.reshape(pre, m1, m2, L)

    def kernel(x_ref, k1_ref, k2_ref, o_ref):
        t = x_ref[0]  # (m1, m2, BL)
        t = lax.dot_general(
            k2_ref[:], t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (o2, m1, BL) f32
        t = lax.dot_general(
            k1_ref[:], t.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (o1, o2, BL)
        o_ref[0] = t.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, m1, m2, BL), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m1, m2, BL), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pre, m1, m2, L), out_dtype),
        compiler_params=_SLAB_VMEM,
    )(x4, K1c, K2c)


def make_variant(factors, pair_mode, p2_mode, io_dtype=jnp.float32,
                 mid_default=False):
    ms = [int(K.shape[0]) for K in factors]
    m = int(np.prod(ms))
    G0 = 128 // ms[0]

    def mv(v):
        x = p1_pass(
            v.reshape(1, ms[0] * G0, m // ms[0] // G0),
            factors[0], G0, factors[3], factors[4], pair_mode,
            out_dtype=jnp.bfloat16, mid_default=mid_default,
        )
        x = p2_pass(x.reshape(-1), ms[0], factors[1], factors[2], p2_mode,
                    out_dtype=io_dtype)
        return x.reshape(m)

    return mv


def main(which=""):
    d, md = 5, 32
    m = md**d
    rng = np.random.default_rng(0)
    factors = tuple(
        jnp.asarray(rng.standard_normal((md, md)) / (2.2 * np.sqrt(md)), jnp.float32)
        for _ in range(d)
    )
    v = jnp.asarray(rng.standard_normal(m), jnp.float32)
    exact = kron_matvec_fast(factors, v, precision=lax.Precision.HIGHEST)
    exn = float(jnp.linalg.norm(exact))

    def report(key, name, mv, vin):
        if which and key not in which:
            return
        out = jax.jit(mv)(vin)
        rel = float(jnp.linalg.norm(out.astype(jnp.float32) - exact)) / exn
        t = _timed_loop(mv, vin, iters=30)
        eff = 2 * d * m * 4 / t / 1e9
        print(f"{name:38s} {t*1e3:7.3f} ms  eff {eff:6.1f} GB/s  rel {rel:.2e}",
              flush=True)

    report("A", "A: prod slab DEFAULT bf16-mid",
           lambda vv: kron_matvec_slab(factors, vv, precision=lax.Precision.DEFAULT,
                                       mid_dtype=jnp.bfloat16), v)
    report("B", "B: P1 lane1024 + P2 twodot", make_variant(factors, "lane1024", "twodot"), v)
    report("C", "C: P1 transpose + P2 merged", make_variant(factors, "transpose", "merged"), v)
    report("D", "D: P1 transpose + P2 twodot", make_variant(factors, "transpose", "twodot"), v)
    vb = v.astype(jnp.bfloat16)
    report("E", "E: D, bf16 in/out",
           make_variant(factors, "transpose", "twodot", io_dtype=jnp.bfloat16), vb)
    report("F", "F: A-shape, bf16 in/out",
           make_variant(factors, "lane1024", "merged", io_dtype=jnp.bfloat16), vb)
    report("G", "G: A-shape, DEFAULT mid",
           make_variant(factors, "lane1024", "merged", mid_default=True), v)
    report("H", "H: G, bf16 in/out",
           make_variant(factors, "lane1024", "merged", io_dtype=jnp.bfloat16,
                        mid_default=True), vb)


if __name__ == "__main__":
    main("".join(sys.argv[1:]))
