"""Grid interpolation operators (SKI-style sparse Khatri-Rao weights).

BASELINE config 2 names "SKI-style interpolation weights": scattered points
are tied to a Cartesian grid by a sparse interpolation matrix ``W`` whose row
``i`` factorizes over dimensions, ``W[i] = ⊗_d w_d(x_i)``, with each ``w_d``
having two non-zeros (linear interpolation between the bracketing grid
points).  In the reference's vocabulary this is a row-partitioned Khatri-Rao
product of per-dimension *sparse* factors (``SelectionMatrixSparse`` +
``KhatriRaoMatrix`` — SURVEY.md §2 #2/#4); on TPU it is index arrays +
gathers/scatters, ``O(n · 2^d)`` per product with no sparse-matrix machinery.

``W @ v_grid`` interpolates grid values to the points; ``Wᵀ @ u`` spreads
point mass onto grid corners.  Combined with the Kronecker Gram this gives the
SKI kernel ``k̂(x, z) = W_x (⊗K_d) W_zᵀ`` whose matvec is
gather → Kron-matvec → scatter, all structured.
"""

from __future__ import annotations

import itertools
import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "InterpWeights",
    "interp_weights",
    "interp_matvec",
    "interp_rmatvec",
    "interp_matvec_bm",
    "interp_rmatvec_bm",
    "interp_expand",
]


class InterpWeights(NamedTuple):
    """Per-dimension linear-interpolation data for ``n`` points on a grid.

    ``idx[d]``: ``(n,)`` int32 — left bracketing grid index in dim ``d``;
    ``w[d]``: ``(n, 2)`` — weights of (left, right) grid points;
    ``shape``: the grid shape ``(m_1, ..., m_d)``.
    """

    idx: Tuple[jax.Array, ...]
    w: Tuple[jax.Array, ...]
    shape: Tuple[int, ...]


def interp_weights(x: jax.Array, xg: Sequence[jax.Array]) -> InterpWeights:
    """Linear interpolation weights of points ``x`` (n, d) on grid ``xg``.

    Points outside the grid clamp to the boundary cell (constant
    extrapolation of the cell's linear model).  Jittable: ``searchsorted`` +
    arithmetic only.
    """
    if x.ndim == 1:
        x = x[:, None]
    idxs, ws = [], []
    for d, g in enumerate(xg):
        gd = g.reshape(-1)
        m = gd.shape[0]
        xi = x[:, d]
        if m == 1:
            # Degenerate dimension (e.g. a constant feature column): all mass
            # on the single grid point.
            idxs.append(jnp.zeros(xi.shape, jnp.int32))
            ws.append(
                jnp.stack([jnp.ones_like(xi), jnp.zeros_like(xi)], axis=1).astype(x.dtype)
            )
            continue
        left = jnp.clip(jnp.searchsorted(gd, xi, side="right") - 1, 0, m - 2)
        g0 = gd[left]
        g1 = gd[left + 1]
        span = g1 - g0
        t = jnp.clip((xi - g0) / jnp.where(span > 0, span, 1.0), 0.0, 1.0)
        idxs.append(left.astype(jnp.int32))
        ws.append(jnp.stack([1.0 - t, t], axis=1).astype(x.dtype))
    return InterpWeights(
        idx=tuple(idxs), w=tuple(ws), shape=tuple(int(g.shape[0]) for g in xg)
    )


def _corner_flat_idx(iw: InterpWeights, offsets) -> jax.Array:
    """Flat C-order grid index of one corner combination (n,).

    Corner indices clip to the dimension bound so phantom corners of
    degenerate (m_d = 1) dimensions — whose weight is exactly zero — cannot
    bleed into neighbouring flat indices.
    """
    flat = None
    for d, (left, off) in enumerate(zip(iw.idx, offsets)):
        comp = jnp.minimum(left + off, iw.shape[d] - 1)
        flat = comp if flat is None else flat * iw.shape[d] + comp
    return flat


def interp_matvec(iw: InterpWeights, v_grid: jax.Array) -> jax.Array:
    """``W @ v``: interpolate grid values to the points.  ``v``: ``(M,)`` or
    ``(M, B)``; output ``(n,)`` / ``(n, B)``.  O(n·2^d) gathers."""
    d = len(iw.shape)
    squeeze = v_grid.ndim == 1
    vv = v_grid[:, None] if squeeze else v_grid
    out = None
    for offsets in itertools.product((0, 1), repeat=d):
        flat = _corner_flat_idx(iw, offsets)
        weight = None
        for dd, off in enumerate(offsets):
            wd = iw.w[dd][:, off]
            weight = wd if weight is None else weight * wd
        contrib = weight[:, None] * jnp.take(vv, flat, axis=0)
        out = contrib if out is None else out + contrib
    return out[:, 0] if squeeze else out


def interp_rmatvec(iw: InterpWeights, u: jax.Array) -> jax.Array:
    """``Wᵀ @ u``: scatter point values onto grid corners.  Output ``(M,)`` /
    ``(M, B)``."""
    d = len(iw.shape)
    M = math.prod(iw.shape)
    squeeze = u.ndim == 1
    uu = u[:, None] if squeeze else u
    out = jnp.zeros((M, uu.shape[1]), dtype=uu.dtype)
    for offsets in itertools.product((0, 1), repeat=d):
        flat = _corner_flat_idx(iw, offsets)
        weight = None
        for dd, off in enumerate(offsets):
            wd = iw.w[dd][:, off]
            weight = wd if weight is None else weight * wd
        out = out.at[flat].add(weight[:, None] * uu)
    return out[:, 0] if squeeze else out


def interp_matvec_bm(iw: InterpWeights, v_grid_bm: jax.Array) -> jax.Array:
    """Batch-major ``W @ v``: ``v`` is ``(B, M)``, output ``(B, n)``.

    TPU layout note: a ``(M, B)`` array with huge ``M`` and small ``B`` is
    lane-padded ``B → 128`` by the default ``T(8,128)`` tiling (a (1M, 9)
    lattice intermediate costs 14× its logical bytes — enough to OOM the
    combined CG+SLQ NLML program, RESULTS_r2.md §7).  Batch-major keeps the
    long axis on lanes, so padding is bounded by the sublane round-up of
    ``B`` to 8."""
    d = len(iw.shape)
    out = None
    for offsets in itertools.product((0, 1), repeat=d):
        flat = _corner_flat_idx(iw, offsets)
        weight = None
        for dd, off in enumerate(offsets):
            wd = iw.w[dd][:, off]
            weight = wd if weight is None else weight * wd
        contrib = weight[None, :] * v_grid_bm[:, flat]
        out = contrib if out is None else out + contrib
    return out


def interp_rmatvec_bm(iw: InterpWeights, u_bm: jax.Array) -> jax.Array:
    """Batch-major ``Wᵀ @ u``: ``u`` is ``(B, n)``, output ``(B, M)`` —
    see :func:`interp_matvec_bm` for why batch-major matters at large M."""
    d = len(iw.shape)
    M = math.prod(iw.shape)
    out = jnp.zeros((u_bm.shape[0], M), dtype=u_bm.dtype)
    for offsets in itertools.product((0, 1), repeat=d):
        flat = _corner_flat_idx(iw, offsets)
        weight = None
        for dd, off in enumerate(offsets):
            wd = iw.w[dd][:, off]
            weight = wd if weight is None else weight * wd
        out = out.at[:, flat].add(weight[None, :] * u_bm)
    return out


def interp_expand(iw: InterpWeights) -> jax.Array:
    """Densify ``W`` to ``(n, M)`` — test oracle only."""
    n = iw.idx[0].shape[0]
    M = math.prod(iw.shape)
    eye = jnp.eye(M, dtype=iw.w[0].dtype)
    return interp_matvec(iw, eye)
