"""Pallas TPU kernel: fused GRIEF Φ assembly (gather+product in one pass).

The XLA Φ loop (kernels/grief.py) already runs at stream bandwidth *per pass*,
but it makes ``d`` passes over the ``(n, p)`` accumulator — ``2·d·n·p`` words
of HBM traffic (measured 544–626 GB/s on v5e; see benchmarks/RESULTS_r1.md).
This kernel fuses all ``d`` dimensions in VMEM, reducing traffic to the
information-theoretic floor ``n·Σm_d + n·p`` — a 12–45× reduction at the
measured shapes.

Mosaic cannot gather along the lane dimension, so the per-dimension column
selection ``B_d[:, idx[:, d]]`` is expressed as a matmul with a precomputed
one-hot selection matrix ``S_d = onehot(idx[:, d])`` of shape ``(m_d, p)``:

    tile (BN, p):  acc = Π_d  (B_d-tile (BN, m_d) @ (S_d · scale_d))

which also folds the per-dimension ``λ^{-1/2}`` normalization into ``S_d``.
All in-kernel ops are 2-D MXU dots and elementwise products — no reshapes, no
gathers.  Requires equal per-dimension grid sizes (the common ``mbar`` case);
ragged grids fall back to the XLA path at the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["phi_fused_pallas"]

_VMEM_BUDGET = 10 * 1024 * 1024  # bytes


def _largest_divisor(n: int, bound: int) -> int:
    b = max(1, min(n, bound))
    while n % b:
        b -= 1
    return b


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _phi_xla_ref(B_stack, S_stack, precision):
    """The equivalent XLA per-dim loop (used as fallback and as the VJP's
    backward program — einsum over the stacked dim keeps it one fused HLO)."""
    C = jnp.einsum("dnm,dmp->dnp", B_stack, S_stack, precision=precision)
    return jnp.prod(C, axis=0)


def phi_fused_pallas(
    B_stack: jax.Array,
    S_stack: jax.Array,
    *,
    block_rows: int = 512,
    precision=lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``Φ[i, j] = Π_d (B_stack[d] @ S_stack[d])[i, j]``.

    Args:
      B_stack: ``(d, n, m)`` stacked per-dimension feature matrices
        (``K_xU_d @ Q_d``), equal ``m`` per dimension.
      S_stack: ``(d, m, p)`` scaled one-hot selection matrices
        (``onehot(idx[:, d]) · λ_d[idx[:, d]]^{-1/2}``).

    Returns ``(n, p)``.  Differentiable: custom VJP routes the backward pass
    through the XLA reference program (grads w.r.t. both stacks).
    """
    return _phi_fused(int(block_rows), precision, bool(interpret), B_stack, S_stack)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _phi_fused(block_rows, precision, interpret, B_stack, S_stack):
    return _phi_fused_primal(block_rows, precision, interpret, B_stack, S_stack)


def _phi_fused_fwd(block_rows, precision, interpret, B_stack, S_stack):
    out = _phi_fused_primal(block_rows, precision, interpret, B_stack, S_stack)
    return out, (B_stack, S_stack)


def _phi_fused_bwd(block_rows, precision, interpret, res, g):
    B_stack, S_stack = res
    _, vjp = jax.vjp(lambda b, s: _phi_xla_ref(b, s, precision), B_stack, S_stack)
    return vjp(g)


def _phi_fused_primal(block_rows, precision, interpret, B_stack, S_stack):
    d, n, m = B_stack.shape
    p = S_stack.shape[2]
    itemsize = B_stack.dtype.itemsize
    # VMEM accounting with lane padding (Mosaic pads the last dim to 128):
    # double-buffered B block + out block + the full S operand.
    per_row = d * _pad128(m) * itemsize * 2 + _pad128(p) * itemsize * 2
    s_bytes = d * m * _pad128(p) * itemsize
    avail = _VMEM_BUDGET - s_bytes
    if avail < per_row * 8:
        # The full S operand (plus a minimal 8-row block) would not fit in
        # scoped VMEM — Mosaic would fail at compile time.  Same math via the
        # XLA per-dim loop (measured at stream roofline per pass).
        return _phi_xla_ref(B_stack, S_stack, precision)
    # Mosaic requires the sublane (second-to-last) block dim to be a multiple
    # of 8 or equal to the array dim: BN must be a divisor of n that is ≡ 0
    # (mod 8), or n itself.  n with no such divisor under the VMEM bound
    # (e.g. odd n) falls back to the XLA loop.
    bound = min(block_rows, avail // per_row)
    if n % 8 == 0:
        BN = 8 * _largest_divisor(n // 8, max(1, bound // 8))
    elif n * per_row <= avail + per_row * 8:
        BN = n  # single block: "equal to the array dim" satisfies Mosaic
    else:
        return _phi_xla_ref(B_stack, S_stack, precision)

    def kernel(b_ref, s_ref, o_ref):
        # Measured on v5e at n=30k/d=8/p=384 vs the XLA per-dim loop:
        # HIGHEST (default) 1.5× speedup @ 2e-4 rel err; Precision.DEFAULT
        # (bf16 single-pass) 4.2× @ 2e-2 (B and the λ^{-1/2} scales round to
        # bf16, compounding ~4e-3/dim across the product).
        acc = jnp.dot(
            b_ref[0], s_ref[0],
            preferred_element_type=o_ref.dtype,
            precision=precision,
        )
        for dd in range(1, d):
            acc = acc * jnp.dot(
                b_ref[dd], s_ref[dd],
                preferred_element_type=o_ref.dtype,
                precision=precision,
            )
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(n // BN,),
        in_specs=[
            pl.BlockSpec((d, BN, m), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p), B_stack.dtype),
        interpret=interpret,
    )(B_stack, S_stack)


_phi_fused.defvjp(_phi_fused_fwd, _phi_fused_bwd)
