"""Lazy linear-operator composition: products and sums of matvec closures.

Counterpart of the reference's ``TensorProduct`` / ``TensorSum`` lazy
operators (reference: ``gp_grief/tensors.py`` — SURVEY.md §2 #5).  In JAX an
operator *is* its matvec closure, so composition is function composition —
these helpers exist for API parity and for building solver operands from
structured pieces without densifying.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax

__all__ = ["op_product", "op_sum", "op_scale", "op_shift"]

MatVec = Callable[[jax.Array], jax.Array]


def op_product(ops: Sequence[MatVec]) -> MatVec:
    """``(A_1 · A_2 · … · A_k) v`` — chained matvecs, applied right-to-left."""

    def mv(v):
        for op in reversed(list(ops)):
            v = op(v)
        return v

    return mv


def op_sum(ops: Sequence[MatVec]) -> MatVec:
    """``(A_1 + … + A_k) v`` — summed matvecs."""

    def mv(v):
        out = None
        for op in ops:
            out = op(v) if out is None else out + op(v)
        return out

    return mv


def op_scale(op: MatVec, c) -> MatVec:
    """``(c·A) v``."""
    return lambda v: c * op(v)


def op_shift(op: MatVec, c) -> MatVec:
    """``(A + c·I) v`` — the ubiquitous noise-shifted operator."""
    return lambda v: op(v) + c * v
