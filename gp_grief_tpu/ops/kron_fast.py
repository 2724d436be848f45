"""Bandwidth-optimized Kronecker matvec for TPU solver hot loops.

Measured on v5e (bench.py methodology — slope-timed chained loops):

| formulation                                   | d=5, m_d=32 (134 MB vec) |
|-----------------------------------------------|--------------------------|
| naive per-factor chain (tensordot+moveaxis)   | 220 GB/s effective       |
| per-factor Pallas passes (narrow contractions)| 80–215 GB/s              |
| pair-grouped cyclic passes (this module)      | 345–450 GB/s             |
| **2-pass Pallas slab schedule (ops/pallas)**  | **~510 GB/s @ DEFAULT**  |

(effective GB/s = the d-pass algorithmic-traffic model ``2·d·m·itemsize / t``;
round-2 numbers in benchmarks/RESULTS_r2.md.)

Two ideas behind the cyclic XLA chain (the general-shape path):

1. **Adjacent-factor grouping**: merge neighbours into super-factors of width
   ~1K (``K_i ⊗ K_{i+1}`` materialized — a few MB), so each cyclic pass is one
   large MXU matmul at the f32 matmul roofline instead of a narrow
   VPU/MXU-starved contraction.  Cuts pass count ~2×.
2. **Cyclic rotation passes**: ``X ← (K_g · X)ᵀ`` with ``X = v.reshape(m_g,
   m/m_g)`` — after one pass per (super-)factor in order, the lattice ordering
   is restored.  XLA fuses the transpose into the matmul epilogue.

Every physical pass costs its HBM DMA plus its MXU time (they serialize
through this runtime — measured, benchmarks/exp_r2_dma_overlap.py), so the
round-2 winner is the rotation-free Pallas slab schedule
(``ops.pallas.kron_pallas.kron_matvec_slab``) which collapses d=5 into 2–3
physical passes; :func:`kron_matvec_fast` dispatches to it on TPU for
applicable shapes at bandwidth-oriented precisions.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gp_grief_tpu.utils.checks import is_tpu_backend as _is_tpu

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
    impl: str = "auto",
) -> jax.Array:
    """``(⊗_d K_d) @ v`` via the fastest applicable formulation.

    ``v``: ``(M,)`` or ``(M, B)``.  Jittable, differentiable.

    ``precision`` picks the accuracy/bandwidth point (v5e, d=5×32 headline,
    round-2 measurements in benchmarks/RESULTS_r2.md):

    - ``HIGHEST`` (default): exact f32 (rel err ~1e-7) — the correctness-
      first solver default.  On TPU, shapes in the general fused schedule's
      EXACT-grade win classes (whole-lattice single pass; a ≥256-wide
      factor — :func:`fused_schedule_applicable` with ``fast=False``) run
      :func:`kron_matvec_fused` at Mosaic HIGHEST (same grade, measured
      3.6–10× — round-5 dispatch flip); everything else runs the grouped
      cyclic XLA chain.  ``impl="xla"`` forces the chain.
    - ``Precision.DEFAULT``: bf16 MXU products.  On TPU, shapes accepted by
      :func:`gp_grief_tpu.ops.pallas.slab_schedule_applicable` dispatch to the
      rotation-free 2-pass Pallas slab schedule (rel err ~4e-3 — the P1 mid
      and pair dots both run bf16 at this point, ~1.9× the
      cyclic XLA chain); others run the cyclic chain.  This is the operating
      point of the refined-CG hot loop (``ops.cg.cg_solve_refined``), whose
      exact-residual refreshes restore full solution accuracy.
    - a ``lax.DotAlgorithmPreset`` (e.g. ``BF16_BF16_F32_X3``): on TPU,
      slab-applicable shapes upgrade to the slab's HIGHEST path (rel err
      ~4e-6 — at least as accurate as X3, faster; 2-pass fused-mid schedule,
      355 GB/s eff at the d=5×32 headline — RESULTS_r13.md); slab-rejected
      shapes with a feasible GENERAL fused plan (ragged m_d, d=2,
      leading-identity batched forms — round-4) run
      :func:`gp_grief_tpu.ops.pallas.kron_matvec_fused` at Mosaic HIGHEST
      (rel ~1e-7; 2.9–4× the cyclic chain on batched d=2 lattices,
      benchmarks/exp_r14_general.py); others run the cyclic chain with the
      requested algorithm.

    ``impl``: ``"auto"`` (dispatch as above), ``"xla"`` (force the grouped
    cyclic chain), ``"slab"`` (force the Pallas slab; raises if
    inapplicable), ``"fused"`` (force the general fused schedule; raises if
    inapplicable).
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    if precision is None:
        precision = lax.Precision.DEFAULT
    elif isinstance(precision, str):
        precision = lax.Precision(precision)
    if impl != "xla":
        from gp_grief_tpu.ops.pallas.kron_pallas import (
            fused_schedule_applicable,
            kron_matvec_fused,
            kron_matvec_slab,
            slab_schedule_applicable,
        )

        applicable = (
            _is_tpu()
            and slab_schedule_applicable(factors, int(v.shape[1]))
        )
        if impl == "slab" and not applicable:
            raise ValueError(
                "kron_matvec_fast(impl='slab') needs a TPU backend and "
                "slab_schedule_applicable shapes"
            )
        want_slab = applicable and not (
            isinstance(precision, lax.Precision)
            and precision != lax.Precision.DEFAULT
        )
        if want_slab:
            slab_prec = (
                lax.Precision.DEFAULT
                if precision == lax.Precision.DEFAULT
                else lax.Precision.HIGHEST
            )
            # At DEFAULT, store inter-pass intermediates bf16: the MXU rounds
            # its inputs to bf16 at this precision anyway, so the halved
            # write+read traffic is mathematically free on TPU (measured
            # identical rel err, 498 → 595 GB/s eff — exp_r3_bf16_mid.py).
            mid = jnp.bfloat16 if slab_prec == lax.Precision.DEFAULT else None
            out = kron_matvec_slab(factors, v, precision=slab_prec, mid_dtype=mid)
            return out[:, 0] if squeeze else out
        # General-shape fused schedule (r14): shapes the slab rejects —
        # ragged m_d, d=2, leading-identity batched forms.  Runs at every
        # precision including plain HIGHEST (round-5): Mosaic HIGHEST is the
        # same exact f32 grade (~1e-7 — x6 emulated dots, RESULTS_r14 §1)
        # and 3.6–10× the cyclic chain on its EXACT-grade win classes
        # (whole-lattice single pass; a ≥256-wide factor), which
        # fused_schedule_applicable(fast=False) gates.  impl="xla" is the
        # escape hatch back to the pure-XLA chain.
        fast_point = (
            precision == lax.Precision.DEFAULT or v.dtype == jnp.bfloat16
        )
        fused_ok = (
            impl in ("auto", "fused")
            and not applicable
            and v.dtype in (jnp.float32, jnp.bfloat16)
            and _is_tpu()
            and fused_schedule_applicable(
                factors, int(v.shape[1]),
                # The DEFAULT / bf16-input operating point runs one bf16 dot
                # per contraction (no x6 compute) — wider win class there.
                # impl="fused" is a FORCE: any feasible plan runs, win-class
                # heuristics gate only the auto dispatch.
                fast=fast_point,
                feasible_only=impl == "fused",
            )
        )
        if impl == "fused" and not fused_ok:
            raise ValueError(
                "kron_matvec_fast(impl='fused') needs a TPU backend, an "
                "f32/bf16 input, and a feasible fused plan (with the slab "
                "schedule inapplicable)"
            )
        # impl="fused" is a FORCE: honor it at any precision (HIGHEST maps
        # to Mosaic HIGHEST).  Under "auto", plain Precision.HIGHEST also
        # dispatches here when the exact-grade win-class gate accepted
        # (round-5 flip — same ~1e-7 grade, measured 3.6–10× faster).
        if fused_ok:
            fprec = (
                lax.Precision.DEFAULT
                if precision == lax.Precision.DEFAULT
                else lax.Precision.HIGHEST
            )
            out = kron_matvec_fused(factors, v, precision=fprec)
            return out[:, 0] if squeeze else out
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
        # lax.dot_general is dtype-strict: a low-precision input vector (e.g.
        # a bf16 solver state, ops/cg.py state_dtype) meets f32 factors here —
        # cast the factor to the vector dtype (a bf16 input already implies
        # the fast operating point; an x64 input keeps full precision).
        x = lax.dot_general(
            X, K.astype(X.dtype), (((0,), (1,)), ((), ())), precision=pass_prec
        )  # (rest·B, mk')
    out = x.reshape(B, rows)
    if squeeze:
        return out[0]
    return out.T


