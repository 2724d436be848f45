"""Direct structured-solve helpers (Cholesky paths + jitter escalation).

Counterpart of the reference's ``linalg.solve_chol`` / ``solve_schur`` helpers
(reference: ``gp_grief/linalg.py`` — SURVEY.md §2 #6; ``solve_schur`` lives in
``ops/kron.py`` next to the eigendecomposition it consumes).  The jitter
escalation mirrors the reference's only failure-handling mechanism — retrying a
failed Cholesky with a larger diagonal shift (SURVEY.md §5, ``dim_noise_var``)
— but branchlessly, with ``lax.cond``-selected attempts inside jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["solve_chol", "stable_cholesky", "logdet_from_chol"]


def solve_chol(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` given ``A = L Lᵀ`` via two triangular solves."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """``log|A|`` from ``A = L Lᵀ``."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def stable_cholesky(
    A: jax.Array,
    *,
    initial_jitter: float = 0.0,
    max_tries: int = 5,
    jitter_scale: float = 1e-8,
) -> Tuple[jax.Array, jax.Array]:
    """Cholesky with deterministic jitter escalation, branchless under jit.

    Attempts ``chol(A + j·mean(diag A)·I)`` for ``j ∈ {initial_jitter,
    jitter_scale·10⁰, …, jitter_scale·10^{max_tries-1}}`` and keeps the first
    success (success = no NaNs in the factor).  All attempts are selected with
    masking rather than host control flow.  Returns ``(L, jitter_used)``.
    """
    diag_mean = jnp.mean(jnp.diagonal(A))
    eye = jnp.eye(A.shape[0], dtype=A.dtype)

    jitters = [initial_jitter] + [
        jitter_scale * (10.0**i) for i in range(max_tries)
    ]

    def attempt(j):
        M = A + j * diag_mean * eye
        # Probe factorization decides success (no gradient flows through a
        # boolean); the value used downstream re-factorizes a sanitized input
        # so failed attempts contribute finite (and mask-zeroed) gradients —
        # nan_to_num on the output alone would still leak NaN cotangents
        # through the cholesky VJP.
        ok = jnp.all(jnp.isfinite(jnp.linalg.cholesky(M)))
        L = jnp.linalg.cholesky(jnp.where(ok, M, eye))
        return L, ok

    L, ok = attempt(jnp.asarray(jitters[0], A.dtype))
    used = jnp.asarray(jitters[0], A.dtype)
    for j in jitters[1:]:
        j = jnp.asarray(j, A.dtype)
        L_new, ok_new = attempt(j)
        take_new = jnp.logical_and(~ok, ok_new)
        L = jnp.where(take_new, L_new, L)
        used = jnp.where(take_new, j, used)
        ok = jnp.logical_or(ok, ok_new)
    return L, used
