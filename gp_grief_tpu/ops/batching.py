"""Batch-size safety wrapper for iterated TPU operator applies.

Empirical finding (v5e via the axon relay, 1M-point SKI lattice operator,
benchmarks/exp_r8_determinism.py): a composed batched linear apply executed
inside a ``lax.scan`` returns RUN-TO-RUN NONDETERMINISTIC results — and
occasionally NaN — when its batch (sublane) extent ``B`` satisfies
``B > 8 and B % 8 != 0``.  Measured safe: ``B ∈ {2..8}`` and every multiple
of 8 tested (16, 24); measured unsafe: 9, 10, 11, 12.  The signature
(bit-level jitter that varies with buffer reuse, single applies clean,
components clean, only the composed diamond-dependency program affected)
points at an XLA:TPU layout/relayout bug reading uninitialized partial-tile
padding rows when a multi-tile ``(B, m)`` array with a partial trailing
sublane tile is reshaped/relayouted while other consumers keep it live.

Until the toolchain fixes it, every solver-facing batched operator routes
through :func:`safe_batch_op`: batch sizes in the unsafe set are padded
with zero rows to the next multiple of 8 (exact for linear operators —
zero rows stay zero and real rows are untouched), then sliced back.  The
pad is a static-shape decision, so safe batch sizes compile to the
original program with zero overhead.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["safe_batch_pad", "safe_batch_op"]


def safe_batch_pad(B: int) -> int:
    """Zero rows to append so a ``(B, m)`` iterated apply avoids the unsafe
    sublane extents (``B > 8 and B % 8 != 0``)."""
    return 0 if B <= 8 else (-B) % 8


def safe_batch_op(
    op: Callable[[jax.Array], jax.Array],
) -> Callable[[jax.Array], jax.Array]:
    """Wrap a LINEAR batched apply ``(B, m) → (B, m)`` so it never executes
    at an unsafe batch extent — see module docstring.  Identity for safe
    ``B`` (static decision, no runtime cost)."""

    def wrapped(v_bm: jax.Array) -> jax.Array:
        B = int(v_bm.shape[0])
        pad = safe_batch_pad(B)
        if pad == 0:
            return op(v_bm)
        vp = jnp.concatenate(
            [v_bm, jnp.zeros((pad, v_bm.shape[1]), v_bm.dtype)], axis=0
        )
        return op(vp)[:B]

    return wrapped
