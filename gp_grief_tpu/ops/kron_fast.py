"""Bandwidth-optimized Kronecker matvec for TPU solver hot loops.

Measured on v5e (bench.py methodology — slope-timed chained loops):

| formulation                                   | d=5, m_d=32 (134 MB vec) |
|-----------------------------------------------|--------------------------|
| naive per-factor chain (tensordot+moveaxis)   | 220 GB/s effective       |
| per-factor Pallas passes (narrow contractions)| 80–215 GB/s              |
| **pair-grouped cyclic passes (this module)**  | **404–450 GB/s**         |
| trailing-slab Pallas pass (ops/pallas)        | 540 GB/s (per pass)      |

(effective GB/s = the d-pass algorithmic-traffic model ``2·d·m·itemsize / t``.)

Two ideas:

1. **Adjacent-factor grouping**: merge neighbours into super-factors of width
   ~1K (``K_i ⊗ K_{i+1}`` materialized — a few MB), so each cyclic pass is one
   large MXU matmul at the f32 matmul roofline instead of a narrow
   VPU/MXU-starved contraction.  Cuts pass count ~2×.
2. **Cyclic rotation passes**: ``X ← (K_g · X)ᵀ`` with ``X = v.reshape(m_g,
   m/m_g)`` — after one pass per (super-)factor in order, the lattice ordering
   is restored.  XLA fuses the transpose into the matmul epilogue.

The layout-preserving Pallas trailing-slab kernel
(``ops.pallas.kron_pallas.last_slab_pass``, 540 GB/s measured) is exported
separately: it only contracts trailing dims without rotating, so chaining it
here would leave the lattice order rotated — a rotation-free full-Pallas
schedule is the round-2 follow-up.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["group_factors", "kron_matvec_fast"]


def _kron2(A: jax.Array, B: jax.Array) -> jax.Array:
    a0, a1 = A.shape
    b0, b1 = B.shape
    return (A[:, None, :, None] * B[None, :, None, :]).reshape(a0 * b0, a1 * b1)


def group_factors(
    factors: Sequence[jax.Array],
    target_width: int = 1024,
    max_width: int = 2048,
) -> Tuple[jax.Array, ...]:
    """Greedily merge adjacent square factors into ~``target_width`` blocks."""
    out = []
    cur = None
    for K in factors:
        if K.shape[0] != K.shape[1]:
            if cur is not None:
                out.append(cur)
                cur = None
            out.append(K)
            continue
        if cur is None:
            cur = K
        elif int(cur.shape[1]) * int(K.shape[1]) <= max_width:
            cur = _kron2(cur, K)
        else:
            out.append(cur)
            cur = K
        if cur is not None and int(cur.shape[1]) >= target_width:
            out.append(cur)
            cur = None
    if cur is not None:
        out.append(cur)
    return tuple(out)


def kron_matvec_fast(
    factors: Sequence[jax.Array],
    v: jax.Array,
    *,
    target_width: int = 1024,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """``(⊗_d K_d) @ v`` via grouped cyclic passes.

    ``v``: ``(M,)`` or ``(M, B)``.  Jittable, differentiable.

    ``precision`` picks the accuracy/bandwidth point (v5e, d=5×32 headline):
    ``HIGHEST`` (default; X6 passes, rel err ~1e-7, 150 GB/s effective),
    ``lax.DotAlgorithmPreset.BF16_BF16_F32_X3`` (2.4e-5, 231 GB/s), or
    ``Precision.DEFAULT`` (bf16 products, ~3e-3, 401 GB/s — what bench.py
    reports).  The layout-preserving Pallas trailing-slab kernel
    (``ops.pallas``, 540 GB/s per pass) is NOT chained here because the cyclic
    rotation invariant requires every pass to rotate — fusing it in needs a
    rotation-free schedule, a round-2 optimization.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    B = int(v.shape[1])
    gf = group_factors(factors, target_width=target_width)
    rows = math.prod(int(K.shape[0]) for K in gf)

    # Cyclic rotation: each pass contracts the (currently) leading
    # super-factor and writes it trailing, so after one pass per factor the
    # order is restored.  The inert batch axis ends up in front.  The
    # contraction is ``(K·X)ᵀ`` expressed directly as one dot_general
    # (contract lhs dim 0) — measured ~30% faster than matmul + transpose
    # (527 vs 401 GB/s effective at DEFAULT precision on v5e: no materialized
    # transpose epilogue).
    x = v
    for K in gf:
        mk = int(K.shape[1])
        X = x.reshape(mk, -1)  # (mk, rest·B)
        # Narrow (width < 128) passes are bandwidth-bound — the MXU has flop
        # headroom to run them at HIGHEST for free, so the requested (fast)
        # precision only ever applies to the wide compute-bound groups.
        pass_prec = precision if mk >= 128 else lax.Precision.HIGHEST
        x = lax.dot_general(
            X, K, (((0,), (1,)), ((), ())), precision=pass_prec
        )  # (rest·B, mk')
    out = x.reshape(B, rows)
    if squeeze:
        return out[0]
    return out.T


