"""Pallas TPU kernels: Kronecker matvec at HBM-roofline bandwidth.

The XLA chain-of-contractions Kron matvec (ops/kron.py) measures ~27% of
stream bandwidth on v5e: each ``tensordot + moveaxis`` pass materializes a
transposed copy (≈4·m words of traffic per pass instead of 2·m) and the
narrow contractions tile poorly.  These kernels keep the ``d``-pass structure
(2·d·m words total — the [B:2] "Kron matvec GB/s" algorithmic model) but make
every pass a minimal-traffic fused kernel with **no transposes anywhere**:

    pass for factor i: view the lattice as (pre, m_i, post·B)
        grid (pre, post·B / BP); block (1, m_i, BP)
        kernel: out = K_i @ block          ← one 2D MXU matmul, in-place layout

Contracting the middle axis directly means the output layout equals the input
layout — no rotation passes, no lane-dim reshapes (which Mosaic forbids).
A sublane-contraction variant (block (BP, m_i), out = block @ K_iᵀ) covers the
final factor of a single-vector matvec where ``post·B == 1``.

Batched right-hand sides fold into the trailing axis, so CG/SLQ workloads
(B ≥ 8) keep every pass's lane dimension wide.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "kron_matvec_pallas",
    "kron_matmat_pallas",
    "last_slab_pass",
    "kron_matvec_slab",
    "slab_schedule_applicable",
]


def last_slab_pass(x2: jax.Array, W: jax.Array, *, BP: int = 2048, interpret: bool = False) -> jax.Array:
    """Layout-preserving contraction of the trailing flat-index slab.

    ``x2``: ``(N, S)`` with ``S`` the trailing slab (≥128 for full lanes);
    ``W``: ``(S', S)`` — typically ``I_G ⊗ K`` widening a narrow factor ``K``
    to a 128-multiple.  Computes ``x2 @ Wᵀ`` blockwise with M-huge MXU tiles.
    **Measured 540 GB/s on v5e** at ``S=128, BP=2048`` — the fastest
    single-pass Kron building block; composes with anything that keeps the
    slab trailing.
    """
    N, S = x2.shape
    So = W.shape[0]
    bp = BP
    while N % bp:
        bp //= 2
    if bp < 8:
        # No clean tiling; fall back to one XLA matmul.
        return x2 @ W.T

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=x_ref.dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=(N // bp,),
        in_specs=[
            pl.BlockSpec((bp, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, So), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, So), x2.dtype),
        interpret=interpret,
    )(x2, W)

_LANE_BLOCK = 2048  # preferred lane-dim tile for the mid-axis kernel
_SUBLANE_BLOCK = 2048  # preferred row tile for the last-factor kernel
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes; in+out blocks double-buffered + K


def _largest_divisor(n: int, bound: int) -> int:
    b = max(1, min(n, bound))
    while n % b:
        b -= 1
    return b


def _pad128(x: int) -> int:
    """Lane padding: Mosaic pads the last dim to a multiple of 128."""
    return -(-x // 128) * 128


def _block_bound(preferred: int, mk: int, mko: int, itemsize: int) -> int:
    """Largest per-block free dim honoring the VMEM budget:
    2·(BP·mk + BP·mko)·itemsize (double-buffered in/out) + mk·mko·itemsize."""
    avail = _VMEM_BUDGET - mk * mko * itemsize
    bound = max(8, avail // (2 * (mk + mko) * itemsize))
    return min(preferred, bound)


def _mid_axis_pass(x3: jax.Array, K: jax.Array, interpret: bool) -> jax.Array:
    """(pre, mk, P) → (pre, mk', P): contract the middle axis with ``K``."""
    pre, mk, P = x3.shape
    mko = K.shape[0]
    BP = _largest_divisor(P, _block_bound(_LANE_BLOCK, mk, mko, x3.dtype.itemsize))

    def kernel(x_ref, k_ref, o_ref):
        o_ref[0] = jnp.dot(k_ref[:], x_ref[0], preferred_element_type=x_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pre, P // BP),
        in_specs=[
            pl.BlockSpec((1, mk, BP), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, mko, BP), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pre, mko, P), x3.dtype),
        interpret=interpret,
    )(x3, K)


def _last_axis_pass(x2: jax.Array, K: jax.Array, interpret: bool) -> jax.Array:
    """(pre, mk) → (pre, mk'): contract the trailing axis (single-vector tail)."""
    pre, mk = x2.shape
    mko = K.shape[0]
    BP = _largest_divisor(pre, _block_bound(_SUBLANE_BLOCK, mk, mko, x2.dtype.itemsize))

    def kernel(x_ref, k_ref, o_ref):
        # out = x @ Kᵀ, expressed as dot_general contracting both last dims.
        o_ref[:] = lax.dot_general(
            x_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=x_ref.dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=(pre // BP,),
        in_specs=[
            pl.BlockSpec((BP, mk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, mko), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pre, mko), x2.dtype),
        interpret=interpret,
    )(x2, K)


def _kmm_primal(interpret: bool, factors, v):
    ms = [int(K.shape[1]) for K in factors]
    B = int(v.shape[1])
    x = v  # logical lattice (m_1, ..., m_d, B), stored row-major
    outs = [int(K.shape[0]) for K in factors]
    cur = list(ms)
    for i, K in enumerate(factors):
        pre = math.prod(cur[:i])
        post = math.prod(cur[i + 1 :]) * B
        if post >= 128 or pre == 1:
            x = _mid_axis_pass(x.reshape(pre, cur[i], post), K, interpret)
        elif post == 1:
            x = _last_axis_pass(x.reshape(pre, cur[i]), K, interpret)
        else:
            # Narrow-but-not-unit tail: fold (mk, post) into one matmul by
            # contracting with K ⊗ I_post (small: (mk·post)² elements).
            eye = jnp.eye(post, dtype=x.dtype)
            Kp = jnp.kron(K, eye)
            x = _last_axis_pass(x.reshape(pre, cur[i] * post), Kp, interpret)
        cur[i] = outs[i]
    return x.reshape(-1, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _kmm(interpret: bool, factors, v):
    return _kmm_primal(interpret, factors, v)


def _kmm_fwd(interpret, factors, v):
    return _kmm_primal(interpret, factors, v), (factors, v)


def _kmm_bwd(interpret, res, g):
    factors, v = res

    def ref(fs, vv):
        # same math as the Pallas chain, via per-factor mid-axis contractions
        ms = [int(K.shape[1]) for K in fs]
        outs = [int(K.shape[0]) for K in fs]
        cur = list(ms)
        x = vv
        B = int(vv.shape[1])
        for i, K in enumerate(fs):
            pre = math.prod(cur[:i])
            post = math.prod(cur[i + 1 :]) * B
            x = x.reshape(pre, cur[i], post)
            x = jnp.einsum(
                "ok,pkq->poq", K, x, precision=lax.Precision.HIGHEST
            )
            cur[i] = outs[i]
        return x.reshape(-1, B)

    _, vjp = jax.vjp(ref, factors, v)
    return vjp(g)


_kmm.defvjp(_kmm_fwd, _kmm_bwd)


def kron_matmat_pallas(
    factors: Sequence[jax.Array],
    v: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """``(⊗_d K_d) @ v`` for ``v`` of shape ``(M, B)`` (or ``(M,)``).

    One fused minimal-traffic pass per factor; layouts are preserved so the
    passes chain with zero transposes.  Rectangular factors supported.
    Differentiable: a custom VJP routes the backward pass through an
    equivalent XLA einsum chain (grads w.r.t. both factors and ``v``).
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    out = _kmm(interpret, tuple(factors), v)
    return out[:, 0] if squeeze else out


def kron_matvec_pallas(
    factors: Sequence[jax.Array],
    v: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Single-vector alias of :func:`kron_matmat_pallas`."""
    return kron_matmat_pallas(factors, v, interpret=interpret)


# ---------------------------------------------------------------------------
# Rotation-free schedule (round-2): every pass is layout-preserving AND
# contraction-widened to >=128 lanes.
#
# Round-1 measured (v5e, d=5 x m_d=32, f32): narrow 32-wide contractions cap
# at 80-215 GB/s; the 128-wide trailing-slab pass hits 540 GB/s.  The fix for
# the MIDDLE factors is the same widening trick applied in place: view the
# lattice as (pre, m_i*G, post/G) with G = 128//m_i filler bits borrowed from
# the NEXT axis and contract the middle axis with K_i (x) I_G — a 128-wide MXU
# matmul whose output layout equals its input layout (the borrowed bits ride
# along under the identity).  No rotations, no split-filler bookkeeping.
#
# The last factors (where post/G falls under a full lane) are handled by ONE
# fused kernel over 4-D blocks (BB, m_{d-2}, m_{d-1}, m_d): a chain of three
# dot_generals, each contracting position 1, cycles the axes
# (a,b,c) -> (b,c,a') -> (c,a',b') -> (a',b',c') — canonical order restored
# inside VMEM for free.
# ---------------------------------------------------------------------------


def _mid_widened_pass(
    x3: jax.Array, K: jax.Array, G: int, precision, interpret: bool
) -> jax.Array:
    """(pre, mk*G, L) -> (pre, mk'*G, L): contract the middle axis with
    ``K (x) I_G`` (contraction width mk*G, typically 128)."""
    pre, mkG, L = x3.shape
    mk = mkG // G
    mko = int(K.shape[0])
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype))  # (mko*G, mk*G)
    itemsize = x3.dtype.itemsize
    bound = _block_bound(_LANE_BLOCK, mkG, mko * G, itemsize)
    BL = _largest_divisor(L, bound)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=x_ref.dtype, precision=precision,
        )

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, mkG, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, mko * G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pre, mko * G, L), x3.dtype),
        interpret=interpret,
    )(x3, W)


def _tail3_pass(
    x4: jax.Array,
    K3: jax.Array,
    K4: jax.Array,
    K5: jax.Array,
    precision,
    interpret: bool,
    block_rows: int = 0,
) -> jax.Array:
    """(N, m3, m4, m5) -> (N, m3', m4', m5'): contract the last three axes in
    one fused VMEM kernel (three position-1 dot_generals; order self-restores).

    VMEM note: the lane (last) axis pads to 128, and ``HIGHEST`` f32 dots
    expand into multi-pass bf16 emulation with extra temporaries (measured:
    BB=8 blocks at HIGHEST blow the 16M scoped limit by 7M), so the default
    row-block size is derived from a padded-bytes model with a 3x temporary
    allowance; pass ``block_rows`` to override.
    """
    N, m3, m4, m5 = x4.shape
    o3, o4, o5 = int(K3.shape[0]), int(K4.shape[0]), int(K5.shape[0])
    if block_rows <= 0:
        itemsize = x4.dtype.itemsize
        padded_block = m3 * m4 * _pad128(max(m5, o5)) * itemsize
        # in+out double-buffered (4x) + ~3 chain temporaries
        block_rows = max(1, (12 * 1024 * 1024) // (7 * padded_block))
    BB = _largest_divisor(N, block_rows)

    def kernel(x_ref, k3_ref, k4_ref, k5_ref, o_ref):
        t = x_ref[:]  # (BB, m3, m4, m5)
        # contract a3: (BB, m3, m4, m5) x K3 -> (BB, m4, m5, o3)
        t = lax.dot_general(
            t, k3_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=t.dtype, precision=precision,
        )
        # contract a4 (now position 1): -> (BB, m5, o3, o4)
        t = lax.dot_general(
            t, k4_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=t.dtype, precision=precision,
        )
        # contract a5 (now position 1): -> (BB, o3, o4, o5)  canonical again
        t = lax.dot_general(
            t, k5_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=t.dtype, precision=precision,
        )
        o_ref[:] = t

    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec(
                (BB, m3, m4, m5), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BB, o3, o4, o5), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, o3, o4, o5), x4.dtype),
        interpret=interpret,
    )(x4, K3, K4, K5)


def _tail2_pass(
    x3: jax.Array, K4: jax.Array, K5: jax.Array, precision, interpret: bool,
    block_rows: int = 32,
) -> jax.Array:
    """(N, m4, m5) -> (N, m4', m5'): fused two-factor tail (two position-1
    dot_generals would leave order (m5', m4'); use three-step with an identity?
    No — two swaps: (a,b) -> (b,a') -> (a',b'), order restores after 2)."""
    N, m4, m5 = x3.shape
    o4, o5 = int(K4.shape[0]), int(K5.shape[0])
    BB = _largest_divisor(N, block_rows)

    def kernel(x_ref, k4_ref, k5_ref, o_ref):
        t = x_ref[:]  # (BB, m4, m5)
        t = lax.dot_general(
            t, k4_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=t.dtype, precision=precision,
        )  # (BB, m5, o4)
        t = lax.dot_general(
            t, k5_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=t.dtype, precision=precision,
        )  # (BB, o4, o5)
        o_ref[:] = t

    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec((BB, m4, m5), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BB, o4, o5), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, o4, o5), x3.dtype),
        interpret=interpret,
    )(x3, K4, K5)


def slab_schedule_applicable(factors: Sequence[jax.Array], B: int = 1) -> bool:
    """True when the rotation-free schedule handles these shapes: square
    factors, each m_d dividing 128, d >= 3, and a large enough lattice."""
    ms = []
    for K in factors:
        if K.ndim != 2 or K.shape[0] != K.shape[1]:
            return False
        m = int(K.shape[0])
        if m < 2 or 128 % m:
            return False
        ms.append(m)
    if len(ms) < 3:
        return False
    m_total = math.prod(ms) * B
    # leading factors need post/G >= 128 lanes; the tail kernel covers the
    # last three axes.  Check every leading factor's lane width.
    tail = ms[-3] * ms[-2] * ms[-1]
    if tail > 64 * 1024:  # tail block must fit VMEM comfortably
        return False
    post = m_total
    for i, m in enumerate(ms[:-3]):
        post //= m
        G = 128 // m
        if post % G or (post // G) % 128:
            return False
    return m_total >= (1 << 18)


def kron_matvec_slab(
    factors: Sequence[jax.Array],
    v: jax.Array,
    *,
    precision=lax.Precision.HIGHEST,
    interpret: bool = False,
    tail_block_rows: int = 8,
) -> jax.Array:
    """Rotation-free layout-preserving Kron matvec (see module section above).

    ``v``: ``(M,)`` or ``(M, B)`` — the batch axis folds into the lanes of the
    leading passes and into the tail kernel's row axis.  Requires
    :func:`slab_schedule_applicable`; callers fall back to the XLA
    grouped-cyclic chain otherwise.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    if not isinstance(precision, lax.Precision):
        # Mosaic cannot lower DotAlgorithm presets (X3/X6/...); HIGHEST is at
        # least as accurate as any of them, so requests upgrade rather than
        # silently degrade.
        precision = lax.Precision.HIGHEST
    ms = [int(K.shape[0]) for K in factors]
    B = int(v.shape[1])
    m = math.prod(ms)
    d = len(ms)
    # batch last: lattice (m_1, ..., m_d, B) — but v is (M, B) already, i.e.
    # exactly that layout flattened.
    x = v.reshape(ms + [B])
    # Leading factors via mid-widened passes.
    for i in range(d - 3):
        pre = math.prod(ms[:i])
        G = 128 // ms[i]
        post = math.prod(ms[i + 1 :]) * B
        x = _mid_widened_pass(
            x.reshape(pre, ms[i] * G, post // G), factors[i], G, precision, interpret
        )
    # Tail: last three factors fused, batch folded into rows?  Batch is the
    # TRAILING axis, inside the tail block's lane dim — fold it into m5's
    # lane axis by treating (m5*B) with K5 (x) I_B.
    N = (m // (ms[-3] * ms[-2] * ms[-1]))
    K5 = factors[-1]
    if B > 1:
        K5 = jnp.kron(K5, jnp.eye(B, dtype=K5.dtype))
    x = _tail3_pass(
        x.reshape(N, ms[-3], ms[-2], ms[-1] * B),
        factors[-3],
        factors[-2],
        K5,
        precision,
        interpret,
        block_rows=tail_block_rows,
    )
    out = x.reshape(m, B)
    return out[:, 0] if squeeze else out
