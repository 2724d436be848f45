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
    "InterpPlan",
    "OneHotPlan",
    "interp_weights",
    "build_interp_plan",
    "build_onehot_plan",
    "make_onehot_rmatvec",
    "interp_matvec",
    "interp_rmatvec",
    "interp_matvec_bm",
    "interp_rmatvec_bm",
    "interp_matvec_bm_fast",
    "interp_rmatvec_bm_fast",
    "interp_rmatvec_bm_exact",
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


class InterpPlan(NamedTuple):
    """Scatter-free interpolation plan (static per model; built once on host).

    XLA's TPU scatter-add serializes colliding updates: the 2^d corner
    scatters of :func:`interp_rmatvec_bm` measured **101 ms** at n=100k,
    m=1.05M, B=9 — 100× the Kron matvec they feed (RESULTS_r3.md §1).  The
    plan re-expresses ``Wᵀ u`` with gathers only, in two flavors:

    **cumsum** (:func:`interp_rmatvec_bm_fast`): sort the ``2^d·n``
    (corner, point) update stream by flat grid index ONCE (host, numpy),
    then per application

        vals = w_sorted ⊙ u[:, src_col]          (one gather)
        cs0  = [0, cumsum(vals, axis=1)]
        out  = cs0[:, end_ptr] − cs0[:, start_ptr]   (two dense gathers)

    where ``start_ptr/end_ptr`` are per-grid-node segment pointers into the
    sorted stream (empty nodes point at equal positions → exact 0).
    Measured 17.7 ms — 5.7× — but the f32 running sum leaves ~5e-5 rel
    error, which SLQ κ-amplifies to ~1% NLML error (unusable there).

    **slots** (:func:`interp_rmatvec_bm_exact`): ELL-format layout — node
    ``j`` gathers its ≤``K`` contributions from padded per-node slot tables
    ``slot_src/slot_w (M, K)`` (w=0 pads) and sums them in registers; the
    few nodes with >``K`` contributions route the excess through a tiny
    residual scatter (``ov_*``).  EXACT: the same short f32 sums the
    scatter-add does, just reordered.

    ``W u`` (forward) becomes one fused gather + an in-register weighted sum
    over the 2^d corners (``gather_flat/gather_w``) — exact, no per-corner
    dispatch.

    Fields: ``src_col (2^d·n,)`` point column per sorted update; ``w_sorted``
    matching weights; ``start_ptr/end_ptr (M,)``; ``gather_flat (2^d, n)`` /
    ``gather_w (2^d, n)``; ``slot_src/slot_w (M, K)``; ``ov_ids/ov_src/ov_w``
    overflow streams (possibly length 0); ``shape``.
    """

    src_col: jax.Array
    w_sorted: jax.Array
    start_ptr: jax.Array
    end_ptr: jax.Array
    gather_flat: jax.Array
    gather_w: jax.Array
    slot_src: jax.Array
    slot_w: jax.Array
    ov_ids: jax.Array
    ov_src: jax.Array
    ov_w: jax.Array
    shape: Tuple[int, ...]


def build_interp_plan(iw: InterpWeights, max_slots: int = 64) -> InterpPlan:
    """Host-side (numpy) preprocessing of an :class:`InterpWeights` into a
    scatter-free :class:`InterpPlan`.  Not jittable (sorts data-dependent
    indices); run once at model construction.

    ``max_slots`` caps the ELL width ``K``; the actual ``K`` is chosen by a
    measured gather-vs-scatter break-even rule (grow while the overflow
    stream exceeds ~M/22 entries), capped at ``max_slots`` — excess
    contributions go to the overflow scatter stream, exact either way.
    The break-even rule self-limits, so the cap only matters at n ≳ m where
    mean contributions/cell = 2^d·n/M exceed it: an 8-cap at n=1M / m=1.05M
    left ~half the 16M corner updates on the 143M-elem/s scatter path
    (~0.1 s per matvec) where K≈20 slot columns gather them at 3.2G elem/s."""
    import numpy as np

    d = len(iw.shape)
    M = math.prod(iw.shape)
    n = int(iw.idx[0].shape[0])
    # One device→host fetch per dim, then pure numpy: the corner loop would
    # otherwise issue ~2^d·d eager device ops (minutes over a remote relay).
    idx_h = [np.asarray(ix) for ix in iw.idx]
    w_h = [np.asarray(w) for w in iw.w]
    flats, weights = [], []
    for offsets in itertools.product((0, 1), repeat=d):
        flat = None
        w = np.ones(n, dtype=w_h[0].dtype)
        for dd, off in enumerate(offsets):
            comp = np.minimum(idx_h[dd] + off, iw.shape[dd] - 1)
            flat = comp if flat is None else flat * iw.shape[dd] + comp
            w = w * w_h[dd][:, off]
        flats.append(flat.astype(np.int64))
        weights.append(w)
    flat_all = np.concatenate(flats)
    w_all = np.concatenate(weights)
    src_all = np.tile(np.arange(n, dtype=np.int64), 2**d)
    # Prune exact-zero weights (points on grid lines, clamped boundary
    # corners, degenerate dims): they contribute nothing but would occupy
    # ELL slots and gather bandwidth.
    nz = w_all != 0
    flat_all, w_all, src_all = flat_all[nz], w_all[nz], src_all[nz]
    perm = np.argsort(flat_all, kind="stable")
    sorted_ids = flat_all[perm]
    uniq_ids, seg_starts = np.unique(sorted_ids, return_index=True)
    seg_ends = np.concatenate([seg_starts[1:], [len(sorted_ids)]])
    node_start = np.zeros(M, dtype=np.int64)
    node_end = np.zeros(M, dtype=np.int64)
    node_start[uniq_ids] = seg_starts
    node_end[uniq_ids] = seg_ends
    src = src_all[perm]
    w_sorted = w_all[perm]

    # ELL slots: rank of each stream entry within its node's segment.
    seg_start_of = node_start[sorted_ids]
    rank = np.arange(len(sorted_ids), dtype=np.int64) - seg_start_of
    # Adaptive width: measured on v5e, a slot column gathers B·M elements at
    # ~3.2G elem/s while an overflow entry scatters B elements at
    # ~143M elem/s — one more column pays for itself only while the overflow
    # stream holds > M·(143/3200) ≈ M/22 entries (RESULTS_r3.md §3).
    max_rank = int(rank.max()) + 1 if len(rank) else 1
    # tail(K) = #entries with rank ≥ K, via one histogram pass (the loop form
    # rescanned the 2^d·n stream per candidate K — minutes at n=1M).
    hist = np.bincount(rank, minlength=max_rank) if len(rank) else np.zeros(1, np.int64)
    tail = len(rank) - np.cumsum(hist)  # tail[k-1] = #(rank >= k)
    K = 1
    while K < min(max_rank, max_slots) and int(tail[K - 1]) > M // 22:
        K += 1
    in_slot = rank < K
    slot_src = np.zeros((M, K), dtype=np.int64)
    slot_w = np.zeros((M, K), dtype=w_all.dtype)
    slot_src[sorted_ids[in_slot], rank[in_slot]] = src[in_slot]
    slot_w[sorted_ids[in_slot], rank[in_slot]] = w_sorted[in_slot]
    ov = ~in_slot

    return InterpPlan(
        src_col=jnp.asarray(src, jnp.int32),
        w_sorted=jnp.asarray(w_sorted),
        start_ptr=jnp.asarray(node_start, jnp.int32),
        end_ptr=jnp.asarray(node_end, jnp.int32),
        gather_flat=jnp.asarray(np.stack(flats), jnp.int32),
        gather_w=jnp.asarray(np.stack(weights)),
        slot_src=jnp.asarray(slot_src, jnp.int32),
        slot_w=jnp.asarray(slot_w),
        ov_ids=jnp.asarray(sorted_ids[ov], jnp.int32),
        ov_src=jnp.asarray(src[ov], jnp.int32),
        ov_w=jnp.asarray(w_sorted[ov]),
        shape=tuple(iw.shape),
    )


def interp_rmatvec_bm_fast(plan: InterpPlan, u_bm: jax.Array) -> jax.Array:
    """Scatter-free batch-major ``Wᵀ @ u``: ``(B, n) → (B, M)`` — see
    :class:`InterpPlan` (f32-cumsum accuracy ~5e-5 rel; inner-loop use)."""
    B = u_bm.shape[0]
    vals = plan.w_sorted[None, :] * u_bm[:, plan.src_col]
    cs0 = jnp.concatenate(
        [jnp.zeros((B, 1), u_bm.dtype), jnp.cumsum(vals, axis=1)], axis=1
    )
    return cs0[:, plan.end_ptr] - cs0[:, plan.start_ptr]


def interp_rmatvec_bm_exact(plan: InterpPlan, u_bm: jax.Array) -> jax.Array:
    """EXACT scatter-free batch-major ``Wᵀ @ u``: ``(B, n) → (B, M)`` via the
    ELL slot layout — see :class:`InterpPlan`.  Same f32 sums as the
    scatter-add form (short per-node reductions, no cumsum), so it is valid
    for the exact CG path and SLQ probes."""
    # Elementwise multiply + sum (VPU) — NOT an einsum/dot: a K-contraction
    # dot could be routed to the MXU and bf16-rounded at DEFAULT precision;
    # this form is exact f32 regardless of the precision config.
    out = jnp.sum(plan.slot_w[None, :, :] * u_bm[:, plan.slot_src], axis=-1)
    if int(plan.ov_ids.shape[0]) > 0:
        out = out.at[:, plan.ov_ids].add(
            plan.ov_w[None, :] * u_bm[:, plan.ov_src]
        )
    return out


class OneHotPlan(NamedTuple):
    """Tile-CSR layout for the one-hot-matmul Pallas ``Wᵀ`` kernel.

    The ELL slot-gather form (:func:`interp_rmatvec_bm_exact`) is bound by
    the XLA gather's ~3.2 G elem/s: it gathers ``B·M·K`` elements per
    application (17 ms at n=100k, m=32⁴, B=9 — RESULTS_r3.md §3), and
    Mosaic's ``dynamic_gather`` is single-vreg, so no VMEM-table gather
    kernel exists.  This plan re-expresses the gather as a *matmul*: tile
    the lattice into ``T`` tiles of ``C`` cells; the points contributing to
    one tile form a small set (``R ≈ 2^d·n·C/M`` before padding).  Per tile

        u_win (B, R) — the tile's contributing point values (ONE XLA gather
                       of ``T·R`` ≈ ``4n`` elements, ~8× fewer than B·M·K)
        SW (R, C)    — sparse weight matrix, built IN VMEM from the
                       ``(K, C)`` loc/weight tables by K one-hot compares
        out (B, C)   = u_win @ SW      (exact f32 MXU dot, HIGHEST)

    so the gather becomes VPU compares + an MXU dot, both memory-bound.
    Exactness: every output cell sums its ≤K weighted contributions in f32
    — the same short sums the scatter-add form does, reordered (measured
    rel 1.4e-7; SLQ-safe, unlike the cumsum form).  Measured 3.9 ms vs
    17 ms for the slot-gather at the n=100k SKI shape (RESULTS_r4.md §5).

    Fields: ``win_src (T·R,)`` point index per window slot (``n`` = zero
    pad); ``slot_loc/slot_w (T, K, C)`` per-cell window-local source index
    (``R`` = empty) and weight; overflow stream ``ov_ids/ov_src/ov_w`` for
    cells with >K contributions; static sizes ``T/C/R/K/M/M_pad/n``.
    """

    win_src: jax.Array
    slot_loc: jax.Array
    slot_w: jax.Array
    ov_ids: jax.Array
    ov_src: jax.Array
    ov_w: jax.Array
    T: int
    C: int
    R: int
    K: int
    M: int
    M_pad: int
    n: int


def build_onehot_plan(
    iw: InterpWeights,
    tile_cells: int = 1024,
    max_slots: int = 8,
    r_limit: int = 4096,
    ov_limit: int | None = None,
):
    """Host-side (numpy) tile-CSR preprocessing for :class:`OneHotPlan`.

    Returns ``None`` when the layout cannot win: a tile whose point window
    exceeds ``r_limit`` (pathologically clustered data would blow the VMEM
    ``(R, C)`` one-hot scratch), or a window gather no smaller than the ELL
    slot gather it replaces.  Callers fall back to
    :func:`interp_rmatvec_bm_exact`.

    ``K`` grows until the overflow stream is tiny (≤ ~1k entries): unlike
    the ELL form — where each slot column is a ``B·M``-element gather — a
    slot layer here costs only a VPU compare pass, while each overflow
    entry is a serialized scatter-add (~63 ns·B on v5e).
    """
    import numpy as np

    d = len(iw.shape)
    M = math.prod(iw.shape)
    n = int(iw.idx[0].shape[0])
    C = int(tile_cells)
    T = -(-M // C)
    M_pad = T * C
    idx_h = [np.asarray(ix) for ix in iw.idx]
    w_h = [np.asarray(w) for w in iw.w]
    flats, weights = [], []
    for offsets in itertools.product((0, 1), repeat=d):
        flat = None
        w = np.ones(n, dtype=w_h[0].dtype)
        for dd, off in enumerate(offsets):
            comp = np.minimum(idx_h[dd] + off, iw.shape[dd] - 1)
            flat = comp if flat is None else flat * iw.shape[dd] + comp
            w = w * w_h[dd][:, off]
        flats.append(flat.astype(np.int64))
        weights.append(w)
    flat_all = np.concatenate(flats)
    w_all = np.concatenate(weights)
    src_all = np.tile(np.arange(n, dtype=np.int64), 2**d)
    nz = w_all != 0  # zero-weight pruning, as in build_interp_plan
    flat_all, w_all, src_all = flat_all[nz], w_all[nz], src_all[nz]

    # The design requires a TINY overflow (each entry is a ~22×-gather-cost
    # serialized scatter).  At n ≳ m the per-cell contribution count
    # (2^d·n/M) exceeds any reasonable K and the overflow explodes — at
    # n=1M / m=1.05M, K=8 left 7.9M of 16M updates on the scatter and the
    # kernel measured 2.4× SLOWER than the wide-ELL slot form
    # (benchmarks/exp_r5g_1m_matvec.py).  Fall back.
    ov_cap = max(1000, M // 100) if ov_limit is None else int(ov_limit)
    # Capacity pre-gate, BEFORE the O(2^d·n log) sort: the K·M slots can
    # hold at most max_slots·M of the nonzero entries, so the overflow is at
    # least total − max_slots·M regardless of how the points cluster.  At
    # the n ≳ m regime this rejects in O(2^d·n) instead of ~6 s of argsort
    # work at n=1M (the plan was doomed either way).
    if int(flat_all.shape[0]) - max_slots * M > ov_cap:
        return None

    perm = np.argsort(flat_all, kind="stable")
    flat_s, w_s, src_s = flat_all[perm], w_all[perm], src_all[perm]
    uniq, seg_start = np.unique(flat_s, return_index=True)
    starts = np.zeros(M, np.int64)
    starts[uniq] = seg_start
    rank = np.arange(len(flat_s)) - starts[flat_s]
    max_rank = int(rank.max()) + 1 if len(rank) else 1
    K = 1
    while K < min(max_rank, max_slots) and int(np.sum(rank >= K)) > 1000:
        K += 1
    in_slot = rank < K
    if int(np.sum(~in_slot)) > ov_cap:
        return None

    tile = flat_s // C
    cell_local = flat_s - tile * C
    # Unique (tile, point) pairs among slot entries → per-tile point windows.
    key = tile[in_slot] * (n + 1) + src_s[in_slot]
    uniq_key = np.unique(key)
    tile_of_key = uniq_key // (n + 1)
    src_of_key = uniq_key % (n + 1)
    tile_start = np.searchsorted(tile_of_key, np.arange(T + 1))
    counts = np.diff(tile_start)
    R_max = int(counts.max()) if len(counts) else 1
    R = max(128, -(-R_max // 128) * 128)
    if R > r_limit:
        return None
    if T * R >= 2 * M * max(K - 1, 1):  # window gather would not beat ELL
        return None
    win_src = np.full((T, R), n, np.int64)
    pos = np.arange(len(uniq_key)) - tile_start[tile_of_key]
    win_src[tile_of_key, pos] = src_of_key
    # Each stream entry's window-local source index.
    eidx = np.searchsorted(uniq_key, key)
    local_r = eidx - tile_start[tile_of_key[eidx]]
    slot_loc = np.full((T, K, C), R, np.int64)  # R = "empty" (out of iota range)
    slot_w = np.zeros((T, K, C), w_all.dtype)
    slot_loc[tile[in_slot], rank[in_slot], cell_local[in_slot]] = local_r
    slot_w[tile[in_slot], rank[in_slot], cell_local[in_slot]] = w_s[in_slot]
    ov = ~in_slot
    return OneHotPlan(
        win_src=jnp.asarray(win_src.reshape(-1), jnp.int32),
        slot_loc=jnp.asarray(slot_loc, jnp.int32),
        slot_w=jnp.asarray(slot_w),
        ov_ids=jnp.asarray(flat_s[ov], jnp.int32),
        ov_src=jnp.asarray(src_s[ov], jnp.int32),
        ov_w=jnp.asarray(w_s[ov]),
        T=T, C=C, R=R, K=K, M=M, M_pad=M_pad, n=n,
    )


def make_onehot_rmatvec(plan: InterpPlan, oplan: OneHotPlan, interpret=None):
    """Build the Pallas one-hot ``Wᵀ`` application ``(B, n) → (B, M)``.

    Returns a differentiable callable (``jax.custom_vjp``: the adjoint of
    ``Wᵀ`` is ``W``, served by the existing fused-gather
    :func:`interp_matvec_bm_fast` on the cotangent).  ``interpret`` defaults
    to True off-TPU so the same code path runs (and is tested) on CPU.

    Call once per model and cache the result — the returned closure's
    identity keys jit caches.
    """
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    T, C, R, K = oplan.T, oplan.C, oplan.R, oplan.K
    M, M_pad, n = oplan.M, oplan.M_pad, oplan.n
    have_ov = int(oplan.ov_ids.shape[0]) > 0
    dtype = oplan.slot_w.dtype

    def kernel(u_ref, loc_ref, w_ref, o_ref):
        u = u_ref[...]  # (B, R)
        iota = lax.broadcasted_iota(jnp.int32, (R, C), 0)
        SW = jnp.zeros((R, C), dtype)
        for k in range(K):  # K ≤ max_slots: unrolled VPU compare passes
            lk = loc_ref[0, k, :][None, :]  # (1, C)
            wk = w_ref[0, k, :][None, :]
            SW = SW + jnp.where(lk == iota, wk, jnp.zeros((), dtype))
        o_ref[...] = lax.dot_general(
            u, SW, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,  # exact f32 (x6 emulation)
            preferred_element_type=dtype,
        )

    def _apply(u_bm):
        B = u_bm.shape[0]
        u_pad = jnp.concatenate([u_bm, jnp.zeros((B, 1), u_bm.dtype)], axis=1)
        u_win = u_pad[:, oplan.win_src]  # (B, T·R) — the one gather
        out = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((B, R), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, C), lambda t: (0, t), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M_pad), dtype),
            interpret=interpret,
        )(u_win.astype(dtype), oplan.slot_loc, oplan.slot_w)
        out = out[:, :M]
        if have_ov:
            out = out.at[:, oplan.ov_ids].add(
                oplan.ov_w[None, :] * u_pad[:, oplan.ov_src].astype(dtype)
            )
        return out

    @jax.custom_vjp
    def rmatvec(u_bm):
        return _apply(u_bm)

    def fwd(u_bm):
        # Residual: a dtype-carrying empty array (residuals must be arrays).
        return _apply(u_bm), jnp.zeros((0,), u_bm.dtype)

    def bwd(res, ct):
        # (Wᵀ)ᵀ = W: fused corner gather on the cotangent.
        return (interp_matvec_bm_fast(plan, ct).astype(res.dtype),)

    rmatvec.defvjp(fwd, bwd)
    return rmatvec


def interp_matvec_bm_fast(plan: InterpPlan, v_grid_bm: jax.Array) -> jax.Array:
    """Batch-major ``W @ v`` via one fused gather over all ``2^d`` corners:
    ``(B, M) → (B, n)``.  Exact (same sums as :func:`interp_matvec_bm`, just
    one gather kernel instead of ``2^d``)."""
    g = v_grid_bm[:, plan.gather_flat]  # (B, 2^d, n)
    return jnp.sum(plan.gather_w[None, :, :] * g, axis=1)


def interp_expand(iw: InterpWeights) -> jax.Array:
    """Densify ``W`` to ``(n, M)`` — test oracle only."""
    n = iw.idx[0].shape[0]
    M = math.prod(iw.shape)
    eye = jnp.eye(M, dtype=iw.w[0].dtype)
    return interp_matvec(iw, eye)
