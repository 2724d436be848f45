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

__all__ = ["kron_matvec_pallas", "kron_matmat_pallas", "last_slab_pass"]


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
