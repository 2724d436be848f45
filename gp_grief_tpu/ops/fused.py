"""Fused CG + Lanczos(SLQ) iterations sharing each operator application.

The iterative NLML of the structured models needs BOTH a CG solve of
``A x = b`` (the quadratic form) and ``R`` Lanczos recurrences on the same
operator (the SLQ log-det probes) — the reference runs them as separate
solver calls (SURVEY.md §2 #7/#8, `gp_grief/linalg.py` cg/lanczos).  On TPU
the hot operators are *batched applies whose cost is flat in the batch
size* over the relevant range: the n=1M SKI windowed ``WᵀW`` apply costs
~107 ms at B=2..9 alike (per-scan-iteration overhead and gather index
counts dominate, not bytes — RESULTS_r6/r7), and the Kron-lattice matvec is
bandwidth-bound on the *lattice* bytes, not the batch.  Running CG's
``(1, m)`` iterations and the SLQ probes' ``(R, m)`` recurrences in
SEPARATE passes therefore pays for the operator twice.

This module advances both through ONE ``(1+R, m)`` application per
iteration: row 0 carries the CG search direction, rows 1..R the Lanczos
probe block.  The arithmetic is exactly :func:`gp_grief_tpu.ops.cg.
_make_pcg_step` (identity preconditioner) and
:func:`gp_grief_tpu.ops.lanczos.lanczos_batched`'s step, so the fused
estimator is the same family as the separate-pass one (identical probe
draws → identical tridiagonals up to batched-apply rounding).

Batch-major (``bm``) layout only — states are ``(B, m)`` rows with the
long axis on TPU lanes (see ``ops.cg._reducers``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from gp_grief_tpu.ops.cg import _reducers
from gp_grief_tpu.ops.lanczos import _slq_quadrature

__all__ = ["make_fused_cg_lanczos_step", "fused_cg_slq_segment"]


def make_fused_cg_lanczos_step(
    op: Callable[[jax.Array], jax.Array],
    _colsum,
    _colnorm,
    _bc,
):
    """One fused iteration: CG state (``Bc`` rows) + ``R`` Lanczos
    recurrences through a single ``op`` application on ``(Bc+R, m)``.

    ``cg_state``: ``(x, r, z, p, rz, dead)`` as in ``ops.cg``;
    ``lz_carry``: ``(q, q_prev, beta_prev, alive)`` as in
    ``ops.lanczos.lanczos_batched``.  Returns the advanced states plus the
    per-iteration Lanczos outputs ``(alpha_out, beta_out, alive)`` for the
    SLQ quadrature.  The preconditioner is the identity (both model
    segmented paths run in a whitened basis where that is exact).
    """

    def step(cg_state, lz_carry):
        x, r, z, p, rz, dead = cg_state
        q, q_prev, beta_prev, alive = lz_carry
        Bc = p.shape[0]
        AV = op(jnp.concatenate([p, q], axis=0))
        Ap, w = AV[:Bc], AV[Bc:]

        # -- CG update: same arithmetic/guards as ops.cg._make_pcg_step ----
        pAp = _colsum(p * Ap)
        ok = (pAp > 0) & (rz > 0) & jnp.isfinite(pAp) & jnp.isfinite(rz) & ~dead
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x = x + _bc(alpha) * p
        r = r - _bc(alpha) * Ap
        z = r  # identity preconditioner
        rz_new = _colsum(r * z)
        dead_new = dead | ~ok | ~jnp.isfinite(rz_new)
        beta = jnp.where(
            dead_new | (rz == 0), 0.0, rz_new / jnp.where(rz == 0, 1.0, rz)
        )
        p = z + _bc(beta) * p
        cg_next = (x, r, z, p, rz_new, dead_new)

        # -- Lanczos update: same arithmetic as lanczos_batched.step -------
        dtype = q.dtype
        eps = jnp.finfo(dtype).eps
        alpha_i = _colsum(w * q)
        w = w - _bc(alpha_i) * q - _bc(beta_prev) * q_prev
        beta_i = _colnorm(w)
        scale = jnp.abs(alpha_i) + beta_prev + jnp.asarray(1.0, dtype)
        broke = beta_i <= 100 * eps * scale
        q_next = jnp.where(
            _bc(broke), jnp.zeros_like(w),
            w / _bc(jnp.where(beta_i == 0, 1.0, beta_i)),
        )
        alpha_out = jnp.where(alive, alpha_i, 0.0)
        beta_out = jnp.where(jnp.logical_and(alive, ~broke), beta_i, 0.0)
        alive_next = jnp.logical_and(alive, ~broke)
        lz_next = (q_next, q, beta_out, alive_next)
        return cg_next, lz_next, (alpha_out, beta_out, alive)

    return step


def fused_cg_slq_segment(
    op: Callable[[jax.Array], jax.Array],
    cg_state,
    Z: jax.Array,
    lanczos_iters: int,
    *,
    axis_name: Optional[str] = None,
):
    """Advance a bm CG state by ``lanczos_iters`` iterations while running a
    full ``R``-probe Lanczos/SLQ pass on the same operator.

    ``Z``: ``(R, m)`` probe block (caller draws it — pass the SAME
    Rademacher draw the separate-pass SLQ would use and the estimator
    matches that family exactly).  Returns ``(cg_state, slq_mean)`` where
    ``slq_mean`` is this chunk's SLQ estimate of ``log|A|`` (mean over the
    ``R`` probes), i.e. exactly what ``ops.lanczos.slq_logdet`` returns for
    the chunk.  Jit-traceable; cost = ``lanczos_iters`` applies of a
    ``(Bc+R, m)`` block instead of ``lanczos_iters`` applies of ``(R, m)``
    PLUS ``lanczos_iters`` applies of ``(Bc, m)``.
    """
    _colsum, _colnorm, _bc = _reducers("bm", axis_name)
    dtype = Z.dtype
    R = Z.shape[0]
    k = int(lanczos_iters)
    q0 = Z / _bc(_colnorm(Z))
    lz0 = (
        q0,
        jnp.zeros_like(q0),
        jnp.zeros((R,), dtype),
        jnp.ones((R,), bool),
    )
    step = make_fused_cg_lanczos_step(op, _colsum, _colnorm, _bc)

    def body(carry, _):
        cgs, lzc = carry
        cgs, lzc, outs = step(cgs, lzc)
        return (cgs, lzc), outs

    (cg_state, _), (alphas, betas, alive_flags) = lax.scan(
        body, (cg_state, lz0), None, length=k
    )
    betas = betas[:-1]
    num_valid = jnp.sum(alive_flags.astype(jnp.int32), axis=0)
    znorm2 = jnp.sum(Z * Z, axis=1)
    if axis_name is not None:
        znorm2 = lax.psum(znorm2, axis_name)
    vals = jax.vmap(
        lambda a, b, nv, zn: zn * _slq_quadrature(a, b, nv, k),
        in_axes=(1, 1, 0, 0),
    )(alphas, betas, num_valid, znorm2)
    return cg_state, jnp.mean(vals)
