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
    "kron_matvec_fused",
    "fused_schedule_applicable",
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
# Rotation-free slab schedule (round 2; 2-pass at every precision since
# round 3): layout-preserving, >=128-lane passes, minimal pass count.
#
# Measured on v5e this round (stream 587 GB/s): EVERY well-formed Pallas
# matmul pass — strided or contiguous blocks, 128- or 1024-wide, bf16 or
# HIGHEST — lands at ~320-335 GB/s (read+write DMA do not overlap through
# the remote runtime: 2 x 134 MB / 587 GB/s = 0.46+0.46 ms ≈ the observed
# 0.83 ms/pass).  The remaining lever is PASS COUNT, so the schedule is:
#
#   P1  fused: widened mid pass for factor 0 (W = K_0 (x) I_G, 128-wide,
#       Mosaic HIGHEST — exact and still DMA-bound) + the trailing
#       (m_{d-2}, m_{d-1}) pair contracted on the LANE axis with
#       W_p = K_{d-2} (x) K_{d-1} (<=2048-wide dense)
#   P2..  remaining mids: at DEFAULT, adjacent mids merge into one wide bf16
#       dot (K_i (x) K_{i+1}); at exact grades they merge into one fused
#       VMEM visit of two sequential Mosaic-HIGHEST dots (_mid2_fused_pass)
#
# d=5 collapses 5 algorithmic passes into 2 physical ones at every
# precision (r13: exact-grade 3.78 ms = 355 GB/s eff at rel 4.4e-6, within
# 3% of the serialized-DMA+compute roofline — RESULTS_r13.md).
#
# Orientation/precision rules (all measured, benchmarks/exp_r2_sweep*.py):
#   * Mosaic HIGHEST (x6 bf16 emulation) is exact (1e-7) and free for
#     128-wide contractions (compute 0.26 ms < 0.46 ms DMA) but
#     compute-bound for 1024-wide ones (2.1 ms) — so mids run HIGHEST and
#     the pair runs split-bf16.
#   * bf16 dots keep their f32 accumulation ONLY in the x-left orientation
#     (lhs = data with its LANE dim contracted: rel err 5.4e-6 for the
#     3-dot hi/lo split); the W-left orientation collapses to single-bf16
#     error (2e-3) no matter how the split is expressed.  The pair
#     contraction is on the lane axis, so it gets the accurate orientation.
#   * At `precision=DEFAULT` the pair is one bf16 dot AND (since r13) the
#     P1 mid dot also runs bf16 (overall ~4e-3 measured — the bf16-MXU
#     operating point); any other `precision` runs the 3-dot split
#     (~1e-5, X3-grade) with mids at Mosaic HIGHEST.
# ---------------------------------------------------------------------------


_SLAB_VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

# Shared VMEM budget of the general fused schedule (scheduler AND pass
# primitives — they must never disagree on feasibility): leaves headroom
# under the 64M scoped limit for double-buffering slop, with operand bytes
# counted at x2.5 (Mosaic HIGHEST's x6 emulation materializes hi/lo bf16
# weight copies — a 2048^2 factor measured 72.9M scoped against 64M with a
# x1 allowance).
_FUSED_VMEM_BUDGET = 36 * 1024 * 1024


def _pick_BL(L: int, row_bytes_per_lane: int, budget: int = 24 * 1024 * 1024) -> int:
    """Largest divisor of L whose in+out blocks (double-buffered) fit the
    budget; prefers >=2048 lanes so strided DMA chunks stay >=8 KB."""
    bound = max(128, budget // (4 * row_bytes_per_lane))
    return _largest_divisor(L, min(L, bound))


def _mid_widened_pass(
    x3: jax.Array, K: jax.Array, G: int, precision, interpret: bool,
    out_dtype=None,
) -> jax.Array:
    """(pre, mk*G, L) -> (pre, mk'*G, L): contract the middle axis with
    ``K (x) I_G`` (contraction width mk*G, typically 128) at Mosaic HIGHEST —
    exact f32 and still DMA-bound at this width (see module notes).

    ``x3`` may be bf16 (a bf16-stored inter-pass intermediate); the weight is
    cast to match.  ``out_dtype`` overrides the output storage dtype —
    accumulation stays f32 (``preferred_element_type``) either way."""
    pre, mkG, L = x3.shape
    mk = mkG // G
    mko = int(K.shape[0])
    out_dtype = x3.dtype if out_dtype is None else jnp.dtype(out_dtype)
    if x3.dtype == jnp.bfloat16:
        # bf16 operands carry no extra bits for HIGHEST's multi-pass
        # emulation, and Mosaic rejects fp32 contract precision on bf16
        # inputs ("Bad lhs type") — one bf16 MXU dot is the honest op.
        precision = lax.Precision.DEFAULT
    W = jnp.kron(K, jnp.eye(G, dtype=K.dtype)).astype(x3.dtype)  # (mko*G, mk*G)
    itemsize = (x3.dtype.itemsize + jnp.dtype(out_dtype).itemsize) // 2
    BL = _pick_BL(L, (mkG + mko * G) * itemsize // 2)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            w_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(o_ref.dtype)

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
        out_shape=jax.ShapeDtypeStruct((pre, mko * G, L), out_dtype),
        compiler_params=_SLAB_VMEM,
        interpret=interpret,
    )(x3, W)


def _split_bf16(W: jax.Array):
    """hi/lo bf16 split of an f32 array (outside-kernel; XLA exact)."""
    hi = W.astype(jnp.bfloat16)
    lo = (W - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _fused_mid_pair_pass(
    x3: jax.Array,
    K0: jax.Array,
    G: int,
    Wp: jax.Array,
    S: int,
    precision,
    interpret: bool,
    out_dtype=None,
) -> jax.Array:
    """P1: widened mid contraction for the leading factor (Mosaic HIGHEST)
    + the trailing (S-wide) lane-pair contraction with ``Wp`` in one VMEM
    visit.  ``x3``: (1, m0*G, L) with L a multiple of S; ``Wp``: (S, S)
    acting on each trailing lane chunk.

    The pair runs in the accuracy-preserving x-left orientation
    (``chunk @ Wpᵀ`` as ``dot_general(chunk, Wp, contract lanes/lanes)``):
    one bf16 dot at ``Precision.DEFAULT`` (where the mid dot is also bf16 —
    overall ~4e-3), else a 3-dot hi/lo split (~1e-5, X3-grade).

    ``out_dtype``: storage dtype of the inter-pass intermediate (bf16 halves
    the pass's write traffic; accumulation stays f32).
    """
    pre, m0G, L = x3.shape
    m0o = int(K0.shape[0])
    out_dtype = x3.dtype if out_dtype is None else jnp.dtype(out_dtype)
    bf16_in = x3.dtype == jnp.bfloat16
    # The mid dot runs one bf16 MXU pass whenever (a) the input is bf16 (a
    # bf16 solver-state vector — Mosaic rejects fp32 contract precision on
    # bf16 operands), or (b) the caller asked for the DEFAULT operating
    # point: Mosaic HIGHEST's x6 emulation costs ~0.26 ms SERIALIZED with
    # the pass DMA, and one bf16 dot buys it back — measured 2.31 → 2.02 ms
    # (582 → 664 GB/s eff) at rel 3.3e-3 → 4.1e-3, the same error order the
    # pair's bf16 dot already sets (exp_r13_p1_mid_bf16.py).  f32
    # accumulation is kept via preferred_element_type either way.
    mid_bf16 = bf16_in or precision == lax.Precision.DEFAULT
    W0 = jnp.kron(K0, jnp.eye(G, dtype=K0.dtype))
    if mid_bf16:
        W0 = W0.astype(jnp.bfloat16)
    Wp_h, Wp_l = _split_bf16(Wp)
    x3_mode = precision != lax.Precision.DEFAULT
    itemsize = (x3.dtype.itemsize + jnp.dtype(out_dtype).itemsize) // 2
    if L % S:
        raise ValueError(
            f"trailing pair width {S} must divide the lane extent {L} "
            "(slab_schedule_applicable gates this)"
        )
    BL = _pick_BL(L, (m0G + m0o * G) * itemsize // 2)
    if BL % S:  # largest divisor of L that is a multiple of S and <= bound
        BL = S * _largest_divisor(L // S, max(1, BL // S))
    n_chunks = BL // S

    def kernel(x_ref, w0_ref, ph_ref, pl_ref, o_ref):
        xb = x_ref[0]
        if mid_bf16 and not bf16_in:
            xb = xb.astype(jnp.bfloat16)  # VPU cast; operands must match W0
        t = lax.dot_general(
            w0_ref[:], xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                lax.Precision.DEFAULT if mid_bf16 else lax.Precision.HIGHEST
            ),
        )  # (m0o*G, BL) f32 accumulation (exact for f32 inputs at HIGHEST)
        for c in range(n_chunks):
            tc = t[:, S * c:S * (c + 1)]  # (m0o*G, S)
            th = tc.astype(jnp.bfloat16)
            acc = lax.dot_general(
                th, ph_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if x3_mode:
                tl = (tc - th.astype(jnp.float32)).astype(jnp.bfloat16)
                acc += lax.dot_general(
                    tl, ph_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc += lax.dot_general(
                    th, pl_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[0, :, S * c:S * (c + 1)] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, m0G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m0o * G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pre, m0o * G, L), out_dtype),
        compiler_params=_SLAB_VMEM,
        interpret=interpret,
    )(x3, W0, Wp_h, Wp_l)


def _mid2_fused_pass(
    x4: jax.Array, K1: jax.Array, K2: jax.Array, interpret: bool,
    out_dtype=None,
) -> jax.Array:
    """(pre, m1, m2, L) → (pre, m1', m2', L): contract BOTH middle axes in one
    VMEM visit — two sequential Mosaic-HIGHEST dots (exact f32; orientation
    does not matter for HIGHEST, only for bf16 hi/lo splits).

    Contracting m2 first then m1, each as a W-left position-contraction, the
    free-dimension ordering restores itself and the lane axis (L-blocks)
    never moves.  One read + one write of the lattice instead of two passes:
    at the d=5×32 headline this is the difference between the 3-pass and
    2-pass exact-grade schedules (RESULTS_r13.md roofline).
    """
    pre, m1, m2, L = x4.shape
    o1, o2 = int(K1.shape[0]), int(K2.shape[0])
    out_dtype = x4.dtype if out_dtype is None else jnp.dtype(out_dtype)
    if x4.dtype == jnp.bfloat16:
        # Same rule as _mid_widened_pass: Mosaic rejects fp32 contract
        # precision on bf16 operands ("Bad lhs type") — cast the weights and
        # run one bf16 MXU dot each; f32 accumulation is kept via
        # preferred_element_type.
        K1, K2 = K1.astype(jnp.bfloat16), K2.astype(jnp.bfloat16)
        dot_prec = lax.Precision.DEFAULT
    else:
        dot_prec = lax.Precision.HIGHEST
    itemsize = (x4.dtype.itemsize + jnp.dtype(out_dtype).itemsize) // 2
    BL = _pick_BL(L, (m1 * m2 + o1 * o2) * itemsize // 2)

    def kernel(x_ref, k1_ref, k2_ref, o_ref):
        t = x_ref[0]  # (m1, m2, BL)
        # contract m2: free dims (o2) + (m1, BL) → (o2, m1, BL)
        t = lax.dot_general(
            k2_ref[:], t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )
        # contract m1: free dims (o1) + (o2, BL) → (o1, o2, BL) — canonical.
        # Match operand dtypes first (the f32 accumulator meets a bf16
        # weight on the bf16 path; no-op cast on the f32 path).
        t = lax.dot_general(
            k1_ref[:], t.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )
        o_ref[0] = t.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec(
                (1, m1, m2, BL), lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, o1, o2, BL), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((pre, o1, o2, L), out_dtype),
        compiler_params=_SLAB_VMEM,
        interpret=interpret,
    )(x4, K1, K2)


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


# ---------------------------------------------------------------------------
# General-shape fused schedule (round 4): rotation-free passes for the shapes
# the slab REJECTS — ragged m_d (unique-value grids), d=2, wide trailing
# pairs.  Two primitives generalize the slab's building blocks:
#
#   _tail_group_pass: contract the TRAILING g axes (any sizes) in one VMEM
#       visit — g sequential position-1 dots whose axis order self-restores
#       (the _tail3_pass pattern for arbitrary g); grid over leading blocks.
#   _mid_group_pass: contract g consecutive MIDDLE axes against a trailing
#       lane extent L — g sequential K-left dots, always contracting operand
#       axis g-1, lane axis never moves (the _mid2_fused_pass pattern for
#       arbitrary g); grid (pre, L // BL).
#
# The scheduler (_fused_schedule) packs factors right-to-left into the
# largest VMEM-feasible tail group, then left-to-right into mid groups —
# a (24, 48, 96) ragged lattice or a 1024x1024 d=2 lattice runs in ONE pass
# (2·m words of traffic, the algorithmic minimum), where the cyclic XLA
# chain pays ~4·m words per factor.  Exactness: all dots Mosaic HIGHEST at
# f32 (or one bf16 MXU dot each at Precision.DEFAULT).
# ---------------------------------------------------------------------------


def _padded_bytes(shape, itemsize) -> int:
    """VMEM footprint of a block: lane (last) dim pads to 128, sublane
    (second-to-last) to 8."""
    if len(shape) == 0:
        return itemsize
    s = list(shape)
    s[-1] = _pad128(s[-1])
    if len(s) >= 2:
        s[-2] = -(-s[-2] // 8) * 8
    return math.prod(s) * itemsize


def _tail_group_bytes(BB, ms, outs, itemsize) -> int:
    """Peak VMEM of a tail-group block chain: in+out double-buffered (4x)
    + the worst intermediate + operands (×2.5: Mosaic HIGHEST's x6
    emulation materializes hi/lo bf16 operand copies — a 2048² factor
    measured 72.9M scoped against a 64M limit with a 1× allowance)."""
    g = len(ms)
    peak_tmp = 0
    for k in range(1, g):
        shape = (BB, *ms[k:], *outs[:k])
        peak_tmp = max(peak_tmp, _padded_bytes(shape, 4))  # f32 accum
    io = 2 * (_padded_bytes((BB, *ms), itemsize) + _padded_bytes((BB, *outs), itemsize))
    ops = sum(_padded_bytes((o, m), itemsize) for o, m in zip(outs, ms))
    return io + 2 * peak_tmp + (5 * ops) // 2


def _pick_lane_block(L: int, bound: int) -> int:
    """Largest legal Mosaic lane-block: a divisor of ``L`` that is a
    multiple of 128 (the Pallas TPU block constraint) and ≤ ``bound``, or
    ``L`` itself (a full-extent block is always legal) when it fits.
    Returns 0 if no legal block exists."""
    best = L if L <= bound else 0
    if L % 128 == 0:
        k = L // 128
        b = min(k, bound // 128)
        while b >= 1:
            if k % b == 0:
                best = max(best, 128 * b)
                break
            b -= 1
    return best


def _tail_group_pass(
    x: jax.Array, Ks: Sequence[jax.Array], precision, interpret: bool,
    block_rows: int = 0,
) -> jax.Array:
    """``(N, m_1, ..., m_g) → (N, o_1, ..., o_g)``: contract every trailing
    axis in one fused VMEM kernel (g sequential position-1 dots; order
    self-restores).  Works for any ``g ≥ 1`` and any axis sizes; grid over
    leading row blocks."""
    N = x.shape[0]
    ms = [int(s) for s in x.shape[1:]]
    outs = [int(K.shape[0]) for K in Ks]
    g = len(ms)
    assert len(Ks) == g
    if block_rows <= 0:
        budget = _FUSED_VMEM_BUDGET
        bb = max(1, N)
        while bb > 1 and _tail_group_bytes(bb, ms, outs, x.dtype.itemsize) > budget:
            bb //= 2
        # Keep ≥ 8 grid steps when N allows: single-digit grids leave the
        # DMA/compute pipeline empty (measured, exp_r14_general.py).
        if N >= 8 * 8:
            bb = min(bb, N // 8)
        block_rows = bb
    BB = _largest_divisor(N, block_rows)

    def kernel(x_ref, *refs):
        k_refs, o_ref = refs[:-1], refs[-1]
        dt = x_ref.dtype
        t = x_ref[:]
        for k_ref in k_refs:
            # Operands matched to the INPUT dtype each dot (no-op for f32;
            # for bf16 inputs this is the honest one-bf16-dot-per-
            # contraction grade — Mosaic is dtype-strict and rejects mixed
            # f32/bf16 operands); accumulation stays f32 either way.
            t = lax.dot_general(
                t.astype(dt), k_ref[:].astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
        o_ref[:] = t.astype(o_ref.dtype)

    zeros = (0,) * g
    return pl.pallas_call(
        kernel,
        grid=(N // BB,),
        in_specs=[
            pl.BlockSpec((BB, *ms), lambda i: (i, *zeros), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in Ks],
        ],
        out_specs=pl.BlockSpec((BB, *outs), lambda i: (i, *zeros), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, *outs), x.dtype),
        compiler_params=_SLAB_VMEM,
        interpret=interpret,
    )(x, *Ks)


def _mid_group_BL(ms, outs, itemsize, pre, L) -> int:
    """Legal lane-block size for a mid-group pass (0 = infeasible).
    Shared by the pass and by :func:`_fused_schedule` so the plan never
    commits to a pass the kernel cannot tile."""
    g = len(ms)
    # Peak per-lane-column bytes across the chain: after k right-to-left
    # contractions the block is (o_{g-k+1..g}, m_{1..g-k}, BL).
    col_peak = max(
        math.prod(outs[g - k :]) * math.prod(ms[: g - k]) * 4
        for k in range(g + 1)
    )
    col_io = (math.prod(ms) + math.prod(outs)) * itemsize
    # Operand allowance ×2.5: Mosaic HIGHEST x6 materializes hi/lo bf16
    # copies of the weights (see _tail_group_bytes).
    budget = _FUSED_VMEM_BUDGET - (
        5 * sum(_padded_bytes((o, m), itemsize) for o, m in zip(outs, ms))
    ) // 2
    if budget <= 0:
        return 0
    bound = max(128, budget // (2 * col_io + 2 * col_peak))
    # Pipelining: keep the grid ≥ 8 blocks when pre is small — a 1-block
    # grid leaves the DMA/compute pipeline empty (measured r14).
    capped = bound
    if pre < 8 and L >= 8 * 128:
        capped = min(bound, max(128, L // 8))
    BL = _pick_lane_block(L, min(L, capped))
    if BL == 0 and capped < bound:
        # The pipelining PREFERENCE must not turn a feasible plan infeasible:
        # when L has no 128-divisible divisor under the cap, fall back to
        # the full VMEM bound (e.g. L=10⁴ at 100³ — only the full-extent
        # block is Mosaic-legal).
        BL = _pick_lane_block(L, min(L, bound))
    return BL


def _mid_group_pass(
    x: jax.Array, Ks: Sequence[jax.Array], precision, interpret: bool,
) -> jax.Array:
    """``(pre, m_1, ..., m_g, L) → (pre, o_1, ..., o_g, L)``: contract every
    middle axis in one fused VMEM visit; the lane axis (L blocks) never
    moves.  g sequential K-left dots, each contracting operand axis g-1."""
    pre = x.shape[0]
    ms = [int(s) for s in x.shape[1:-1]]
    L = int(x.shape[-1])
    outs = [int(K.shape[0]) for K in Ks]
    g = len(ms)
    assert len(Ks) == g
    itemsize = x.dtype.itemsize
    BL = _mid_group_BL(ms, outs, itemsize, pre, L)
    if BL == 0:
        raise ValueError(
            f"_mid_group_pass: no legal lane block for L={L} "
            "(gate with fused_schedule_applicable)"
        )

    def kernel(x_ref, *refs):
        k_refs, o_ref = refs[:-1], refs[-1]
        dt = x_ref.dtype
        t = x_ref[0]  # (m_1, ..., m_g, BL)
        for k_ref in reversed(k_refs):
            # contract the current trailing-most uncontracted group axis —
            # always operand axis g-1 (see module notes); lane axis fixed.
            # Operand dtypes matched to the input (see _tail_group_pass).
            t = lax.dot_general(
                k_ref[:].astype(dt), t.astype(dt), (((1,), (g - 1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
        o_ref[0] = t.astype(o_ref.dtype)

    zeros = (0,) * g
    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec(
                (1, *ms, BL), lambda i, j: (i, *zeros, j), memory_space=pltpu.VMEM
            ),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in Ks],
        ],
        out_specs=pl.BlockSpec(
            (1, *outs, BL), lambda i, j: (i, *zeros, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pre, *outs, L), x.dtype),
        compiler_params=_SLAB_VMEM,
        interpret=interpret,
    )(x, *Ks)


_FUSED_MAX_GROUP = 3  # block rank cap: (lead, a, b, c[, BL]) — Mosaic-tested


def _fused_schedule(ms: Sequence[int], outs: Sequence[int], B: int, itemsize: int):
    """Greedy pass plan for :func:`kron_matvec_fused`.

    Returns ``(mid_groups, tail_start)``: ``mid_groups`` is a list of
    ``(i, j)`` inclusive factor ranges contracted as mid-group passes (in
    order), and factors ``tail_start..d-1`` (+ an I_B when batched) form one
    tail-group pass.  ``None`` if no feasible plan exists."""
    d = len(ms)
    budget = _FUSED_VMEM_BUDGET

    # Lane-pad economics (measured, exp_r14_general.py round 1): every block
    # DMA moves LANE-PADDED bytes, so the trailing axis of any tail block
    # must be ≥ 96 (pad waste ≤ 1.33×).  A trailing batch axis of small B is
    # catastrophic (B=8 → 16× padded traffic: the fused path lost 5.7× to
    # the cyclic chain) — solvers avoid it by folding batches as a LEADING
    # identity factor (B-major; the (eyeB, *factors) convention), which this
    # scheduler handles as an ordinary cheap mid factor.
    if B > 1 and B < 96:
        return None
    if B == 1 and (ms[-1] < 96 or outs[-1] < 96):
        return None

    # Largest tail group feasible by VMEM at BB=1 (including the I_B factor
    # appended for batched inputs so the axis order self-restores).  A tail
    # that swallows (almost) the whole lattice leaves a 1-block grid with no
    # DMA/compute pipelining — measured 133 µs single-block vs ~68 µs
    # pipelined at the 885k eyeB8 shape — so a big tail block is only
    # accepted when ≥ 8 grid blocks remain in front of it (or the block is
    # small enough that pipelining cannot matter).
    tail_start = d
    for t in range(d - 1, -1, -1):
        tms = list(ms[t:]) + ([B] if B > 1 else [])
        touts = list(outs[t:]) + ([B] if B > 1 else [])
        if len(tms) > _FUSED_MAX_GROUP + 1:
            break
        if _tail_group_bytes(1, tms, touts, itemsize) > budget:
            break
        n_lead = math.prod(outs[:t]) if t else 1  # grid extent at execution
        blk = _padded_bytes((1, *tms), itemsize)
        if n_lead < 8 and blk > (1 << 20):
            break
        tail_start = t
    if tail_start == d:
        # Need at least the last factor in the tail (a mid pass for the
        # final factor would have no trailing lane extent).
        return None

    # Mid groups over 0..tail_start-1, greedy left-to-right.
    mid_groups = []
    i = 0
    while i < tail_start:
        j = i
        while (
            j + 1 < tail_start
            and j - i + 1 < _FUSED_MAX_GROUP
            and math.prod(ms[i : j + 2]) * 128 * itemsize * 6 < budget
        ):
            j += 1
        # Trailing lane extent of this pass: ≥ 96 actual lanes (see above),
        # and a legal Mosaic lane block must exist (divisor of L that is a
        # multiple of 128, or a full-extent block within VMEM).  ``pre`` is
        # the product of the ALREADY-CONTRACTED factors' OUTPUT sizes —
        # exactly what _mid_group_pass will see at execution (rectangular
        # factors differ from prod(ms[:i])).
        L = math.prod(ms[j + 1 :]) * B
        pre = math.prod(outs[:i])
        while (
            L < 96
            or _mid_group_BL(ms[i : j + 1], outs[i : j + 1], itemsize, pre, L) == 0
        ):
            if j == i:
                return None
            j -= 1  # shrink the group; a smaller block may tile legally
            L = math.prod(ms[j + 1 :]) * B
        mid_groups.append((i, j))
        i = j + 1
    return mid_groups, tail_start


def fused_schedule_applicable(
    factors: Sequence[jax.Array],
    B: int = 1,
    *,
    fast: bool = False,
    feasible_only: bool = False,
) -> bool:
    """True when :func:`kron_matvec_fused` has a feasible plan AND the shape
    class is one where it beats the cyclic XLA chain — the general-shape
    (ragged / d=2 / wide-pair) companion to :func:`slab_schedule_applicable`
    (round-3 next-step #1).

    EXACT-grade win class (re-measured round-5 on chip — the r14 "whole
    lattice in one pass" class did NOT reproduce at B=1: 24×48×96 0.75×,
    (256, 96) 0.45×, bare 512²/1024² 1.0–1.14×): the fused path wins only
    on LARGE work with a wide factor — a ≥512-wide factor AND ≥2^21 total
    elements (the batched solver forms: (I₈, 512²) 3.51×, (I₁₆, 512²)
    2.18×, (I₈, 1024²) 2.86× — benchmarks/exp_r15 probes).  Everything
    else stays on the cyclic chain at exact grade (losses measured down to
    0.45×; ``impl="fused"`` still forces).

    At ``fast=True`` (the DEFAULT bf16 operating point: ONE bf16 dot per
    contraction instead of x6 emulation) the win class widens to any
    feasible shape with a factor ≥ 100 (100³ 58.5→17.2 µs = 3.4×;
    (I₈, 512²) 599→41 µs = 14×); only the sub-100 ragged multi-factor class
    ((I₈, 24·48·96): 0.9–1.8× across runs, inside run-to-run noise) stays
    on the chain."""
    ms, outs = [], []
    for K in factors:
        if K.ndim != 2:
            return False
        outs.append(int(K.shape[0]))
        ms.append(int(K.shape[1]))
    if not ms or math.prod(ms) * B < (1 << 12):
        return False  # tiny: XLA dispatch wins, nothing to gain
    plan = _fused_schedule(ms, outs, B, int(factors[0].dtype.itemsize))
    if plan is None:
        return False
    if feasible_only:
        # ``impl="fused"`` forcing / experiments: any feasible plan runs —
        # the win-class heuristics below gate only the AUTO dispatch.
        return True
    _, tail_start = plan
    if fast:
        return tail_start == 0 or max(ms) >= 100
    return max(ms) >= 512 and math.prod(ms) * max(B, 1) >= (1 << 21)


def _fused_primal(precision, interpret, factors, v):
    ms = [int(K.shape[1]) for K in factors]
    outs = [int(K.shape[0]) for K in factors]
    B = int(v.shape[1])
    # Same itemsize as fused_schedule_applicable (the factors') so the gate
    # and the execution plan can never disagree on feasibility.
    plan = _fused_schedule(ms, outs, B, int(factors[0].dtype.itemsize))
    if plan is None:
        raise ValueError("kron_matvec_fused: no feasible plan (gate with "
                         "fused_schedule_applicable)")
    mid_groups, tail_start = plan
    d = len(ms)
    cur = list(ms)
    x = v
    for (i, j) in mid_groups:
        pre = math.prod(cur[:i])
        L = math.prod(cur[j + 1 :]) * B
        x = _mid_group_pass(
            x.reshape(pre, *cur[i : j + 1], L), factors[i : j + 1],
            precision, interpret,
        )
        cur[i : j + 1] = outs[i : j + 1]
    if tail_start < d:
        pre = math.prod(cur[:tail_start])
        tKs = list(factors[tail_start:])
        tshape = list(cur[tail_start:])
        if B > 1:
            tKs.append(jnp.eye(B, dtype=v.dtype))
            tshape.append(B)
        x = _tail_group_pass(
            x.reshape(pre, *tshape), tKs, precision, interpret
        )
    return x.reshape(-1, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(precision, interpret, factors, v):
    return _fused_primal(precision, interpret, factors, v)


def _fused_fwd(precision, interpret, factors, v):
    return _fused_primal(precision, interpret, factors, v), (factors, v)


def _fused_bwd(precision, interpret, res, g):
    factors, v = res

    def ref(fs, vv):
        ms = [int(K.shape[1]) for K in fs]
        outs = [int(K.shape[0]) for K in fs]
        cur = list(ms)
        x = vv
        B = int(vv.shape[1])
        for i, K in enumerate(fs):
            pre = math.prod(cur[:i])
            post = math.prod(cur[i + 1 :]) * B
            x = x.reshape(pre, cur[i], post)
            x = jnp.einsum("ok,pkq->poq", K, x, precision=lax.Precision.HIGHEST)
            cur[i] = outs[i]
        return x.reshape(-1, B)

    _, vjp = jax.vjp(ref, factors, v)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def kron_matvec_fused(
    factors: Sequence[jax.Array],
    v: jax.Array,
    *,
    precision=lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """General-shape fused Kron matvec (see the section comment above).

    ``v``: ``(M,)`` or ``(M, B)``.  Any factor shapes (ragged, rectangular,
    d=2) with a feasible plan (:func:`fused_schedule_applicable`); lattices
    whose tail group covers every factor run in ONE pass of 2·m words.
    ``precision``: ``HIGHEST`` = exact f32 (Mosaic x6), ``DEFAULT`` = one
    bf16 MXU dot per contraction (f32 accumulation either way).
    Forward-only Pallas; the custom VJP routes gradients through the XLA
    einsum chain."""
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    if not isinstance(precision, lax.Precision):
        precision = lax.Precision.HIGHEST
    if v.dtype == jnp.bfloat16:
        # bf16 operands carry no extra bits for HIGHEST's emulation, and
        # Mosaic rejects fp32 contract precision on bf16 inputs — one bf16
        # MXU dot per contraction is the honest op (the mixed16 solver
        # operating point; same rule as the slab's _mid_widened_pass).
        precision = lax.Precision.DEFAULT
    out = _fused(precision, bool(interpret), tuple(factors), v)
    return out[:, 0] if squeeze else out


def slab_schedule_applicable(factors: Sequence[jax.Array], B: int = 1) -> bool:
    """True when the 3-pass rotation-free schedule handles these shapes
    efficiently: square factors, d >= 3, every leading factor dividing 128,
    the trailing pair (x batch) between 128 and 2048 lanes wide, and a
    lattice large enough to be bandwidth-bound."""
    ms = []
    for K in factors:
        if K.ndim != 2 or K.shape[0] != K.shape[1]:
            return False
        ms.append(int(K.shape[0]))
    if len(ms) < 3:
        return False
    m_total = math.prod(ms) * B
    S = ms[-2] * ms[-1] * B  # trailing pair chunk (lane width of the pair dot)
    if not (128 <= S <= 2048):
        return False
    post = m_total
    for m in ms[:-2]:
        if m < 2 or 128 % m:
            return False
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
    mid_dtype=None,
) -> jax.Array:
    """Rotation-free 3-pass Kron matvec (see module section above).

    ``v``: ``(M,)`` or ``(M, B)`` — the batch axis folds into the trailing
    lane chunk (``W_p ⊗ I_B``).  Production dispatch goes through
    :func:`slab_schedule_applicable`; other shapes fall back to the XLA
    grouped-cyclic chain (``ops.kron_fast``).

    ``precision``: ``Precision.DEFAULT`` runs the trailing pair AND the P1
    mid dot as single bf16 MXU dots (overall rel err ~4e-3 — the bandwidth
    operating point the refined-CG hot loop uses); anything else runs the
    3-dot hi/lo split (~1e-5, X3-grade) with mid passes at Mosaic
    ``HIGHEST`` (exact, and still DMA-bound at 128-wide).  Forward-only Pallas; the
    custom VJP routes gradients through the XLA einsum chain.

    ``mid_dtype=jnp.bfloat16`` stores the inter-pass intermediates in bf16:
    each pass boundary's HBM write+read halves (every pass is DMA-bound —
    RESULTS_r2.md §1), at a rounding cost on the same order as the DEFAULT
    bf16 products.  Only meaningful with ``precision=DEFAULT``.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    out = _slab(
        precision if isinstance(precision, lax.Precision) else lax.Precision.HIGHEST,
        bool(interpret),
        None if mid_dtype is None else jnp.dtype(mid_dtype),
        tuple(factors),
        v,
    )
    return out[:, 0] if squeeze else out


def _slab_primal(precision, interpret, mid_dtype, factors, v):
    ms = [int(K.shape[0]) for K in factors]
    B = int(v.shape[1])
    m = math.prod(ms)
    d = len(ms)
    S = ms[-2] * ms[-1] * B
    Wp = jnp.kron(factors[-2], factors[-1])
    if B > 1:
        Wp = jnp.kron(Wp, jnp.eye(B, dtype=Wp.dtype))
    # Schedule the remaining middle factors (1..d-3).  Every pass costs its
    # DMA (~0.84 ms at the headline shape) PLUS its MXU time — they serialize
    # through this runtime (measured, benchmarks/exp_r2_passes_today2.py +
    # exp_r2_dma_overlap.py: even a manual DMA pipeline cannot overlap
    # read+write).  So adjacent mids merge into ONE physical pass whenever
    # possible:
    #   * ``Precision.DEFAULT``: one wide bf16 MXU dot over ``K_i ⊗ K_{i+1}``
    #     (≤2048-wide) — the bandwidth operating point;
    #   * exact grades: one fused VMEM visit doing TWO sequential Mosaic-
    #     HIGHEST dots (``_mid2_fused_pass`` — exact f32; the x-left accuracy
    #     rule only constrains bf16 splits, not HIGHEST).
    # d=5 runs in 2 physical passes at every precision.
    steps = []
    i_probe = 1
    while i_probe < d - 2:
        pair_w = ms[i_probe] * ms[i_probe + 1] if i_probe + 1 < d - 2 else 0
        post_i = math.prod(ms[i_probe + 1:]) * B
        if (
            precision == lax.Precision.DEFAULT
            and 128 <= pair_w <= 2048
            and post_i // ms[i_probe + 1] >= 128
        ):
            steps.append(("pair_bf16", i_probe))
            i_probe += 2
        elif precision != lax.Precision.DEFAULT and i_probe + 1 < d - 2:
            steps.append(("mid2", i_probe))
            i_probe += 2
        else:
            steps.append(("mid", i_probe))
            i_probe += 1

    # Inter-pass intermediates may be stored bf16 (mid_dtype): halves the
    # write+read traffic of every pass boundary — each pass's cost is its
    # serialized DMA (RESULTS_r2.md §1), so at the d=5 headline this cuts
    # total traffic 4·m → 3·m words.  Accumulation is always f32; only the
    # HBM storage between passes rounds.
    def _inter(dt_when_more):  # storage dtype for a non-final pass output
        return mid_dtype if (mid_dtype is not None and dt_when_more) else None

    # P1: leading factor (widened mid) fused with the trailing pair.
    G0 = 128 // ms[0]
    x = _fused_mid_pair_pass(
        v.reshape(1, ms[0] * G0, (m // ms[0]) * B // G0),
        factors[0], G0, Wp, S, precision, interpret,
        out_dtype=_inter(len(steps) > 0),
    )
    for si, (kind, i) in enumerate(steps):
        last = si == len(steps) - 1
        odt = v.dtype if last else _inter(True)
        pre = math.prod(ms[:i])
        post_i = math.prod(ms[i + 1:]) * B
        if kind == "pair_bf16":
            W = jnp.kron(factors[i], factors[i + 1])
            x = _mid_widened_pass(
                x.reshape(pre, ms[i] * ms[i + 1], post_i // ms[i + 1]),
                W, 1, lax.Precision.DEFAULT, interpret, out_dtype=odt,
            )
        elif kind == "mid2":
            x = _mid2_fused_pass(
                x.reshape(pre, ms[i], ms[i + 1], post_i // ms[i + 1]),
                factors[i], factors[i + 1], interpret, out_dtype=odt,
            )
        else:
            G = 128 // ms[i]
            x = _mid_widened_pass(
                x.reshape(pre, ms[i] * G, post_i // G),
                factors[i], G, lax.Precision.HIGHEST, interpret,
                out_dtype=odt,
            )
    return x.reshape(m, B).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _slab(precision, interpret, mid_dtype, factors, v):
    return _slab_primal(precision, interpret, mid_dtype, factors, v)


def _slab_fwd(precision, interpret, mid_dtype, factors, v):
    return _slab_primal(precision, interpret, mid_dtype, factors, v), (factors, v)


def _slab_bwd(precision, interpret, mid_dtype, res, g):
    factors, v = res

    def ref(fs, vv):
        ms = [int(K.shape[0]) for K in fs]
        x = vv
        B = int(vv.shape[1])
        for i, K in enumerate(fs):
            pre = math.prod(ms[:i])
            post = math.prod(ms[i + 1:]) * B
            x = x.reshape(pre, ms[i], post)
            x = jnp.einsum("ok,pkq->poq", K, x, precision=lax.Precision.HIGHEST)
        return x.reshape(-1, B)

    _, vjp = jax.vjp(ref, factors, v)
    return vjp(g)


_slab.defvjp(_slab_fwd, _slab_bwd)
