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
    "CornerStream",
    "interp_weights",
    "build_corner_stream",
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
    arithmetic only.  CONCRETE inputs take a host-numpy fast path: run
    eagerly, the ~8 jax ops per dimension each dispatch as a separate
    device program — 135 s at n=1M/32⁴ through the axon relay, vs ~0.2 s
    in numpy — and every consumer of an eager build is a host-side plan
    builder anyway (:func:`build_corner_stream`).
    """
    if not any(
        isinstance(a, jax.core.Tracer) for a in (x, *xg)
    ):
        return _interp_weights_np(x, xg)
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


def _interp_weights_np(x, xg) -> InterpWeights:
    """Host-numpy :func:`interp_weights` (same math, same clamping)."""
    import numpy as np

    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    idxs, ws = [], []
    for d, g in enumerate(xg):
        gd = np.asarray(g).reshape(-1)
        m = gd.shape[0]
        xi = x[:, d]
        if m == 1:
            idxs.append(np.zeros(xi.shape, np.int32))
            ws.append(
                np.stack([np.ones_like(xi), np.zeros_like(xi)], axis=1).astype(x.dtype)
            )
            continue
        left = np.clip(np.searchsorted(gd, xi, side="right") - 1, 0, m - 2)
        g0 = gd[left]
        g1 = gd[left + 1]
        span = g1 - g0
        t = np.clip((xi - g0) / np.where(span > 0, span, 1.0), 0.0, 1.0)
        idxs.append(left.astype(np.int32))
        ws.append(np.stack([1.0 - t, t], axis=1).astype(x.dtype))
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


class CornerStream(NamedTuple):
    """Shared host-side (numpy) corner-update stream; built once per model.

    Every interpolation plan (flat ELL :class:`InterpPlan`, one-hot tile-CSR
    :class:`OneHotPlan`, windowed
    :class:`~gp_grief_tpu.ops.interp_windowed.WindowedPlan`) starts from the
    same multiset of ``2^d·n`` (corner cell, weight, point) updates; building
    it independently per plan cost ~35-50 s host time at n=1M/32⁴ — most of
    it ``2^d·n``-element int64 argsorts and ``np.unique`` re-sorts.

    Two structural facts kill almost all of that work:

    * :func:`interp_weights` clamps ``left ≤ m_d − 2``, and degenerate
      ``m_d = 1`` dims contribute index 0 at weight 0 — so EVERY corner's
      flat index is exactly ``base + consts[k]`` (``base`` = the point's own
      cell; ``consts[k]`` a per-corner constant skipping degenerate dims).
      No per-corner index arithmetic, and after the one ``n``-element sort
      of ``base`` each corner's stream is ALREADY sorted by cell.
    * Per-cell ranks then follow from *counting* (within-corner rank via one
      segment scan shared by all unpruned corners, plus a running per-cell
      offset accumulated corner by corner) — never from a ``2^d·n`` argsort.
      A cell-major sorted stream, where a plan needs one, is a counting
      sort: ``position = cell_start[flat] + rank``.

    Fields (all host numpy; ``L = Σ_k nnz_k`` after zero-weight pruning):
    ``base (n,)`` int32 data-order base cells; ``consts (2^d,)`` int32;
    ``perm/inv_perm (n,)`` int32 cell-sort of the points and its inverse;
    ``base_sorted (n,)``; ``w_pts_sorted (2^d, n)`` per-corner weights in
    sorted-point order (unpruned — zero-weight entries kept for gather
    tables); ``flat_u/w_u/src_u/rank_u (L,)`` the pruned stream in
    corner-major order — flat cell, weight, SORTED-point id, and the
    entry's rank within its cell (a permutation of ``0..c−1`` per cell);
    ``counts (M,)`` per-cell totals; ``tail`` rank-tail histogram
    (``tail[k-1] = #(rank ≥ k)``, the ELL-width selection curve);
    ``shape`` the grid shape.
    """

    base: "object"
    consts: "object"
    perm: "object"
    inv_perm: "object"
    base_sorted: "object"
    w_pts_sorted: "object"
    flat_u: "object"
    w_u: "object"
    src_u: "object"
    rank_u: "object"
    counts: "object"
    tail: "object"
    shape: Tuple[int, ...]


def build_corner_stream(iw: InterpWeights) -> CornerStream:
    """Build the shared :class:`CornerStream` for an :class:`InterpWeights`.

    Host numpy, not jittable; ~3-4 s at n=1M/32⁴ (vs ~15-45 s for each of
    the per-plan builders it replaces the front half of).  Pass the result
    to :func:`build_interp_plan` / :func:`build_onehot_plan` /
    :func:`~gp_grief_tpu.ops.interp_windowed.build_windowed_plan` via their
    ``stream=`` argument to share it.
    """
    import numpy as np

    d = len(iw.shape)
    M = math.prod(iw.shape)
    n = int(np.asarray(iw.idx[0]).shape[0])
    idx_h = [np.asarray(ix).astype(np.int64) for ix in iw.idx]
    w_h = [np.asarray(w) for w in iw.w]
    strides = np.ones(d, np.int64)
    for dd in range(d - 2, -1, -1):
        strides[dd] = strides[dd + 1] * iw.shape[dd + 1]
    smax = int(strides.sum())
    base64 = np.zeros(n, np.int64)
    for dd in range(d):
        base64 += idx_h[dd] * strides[dd]
    base = base64.astype(np.int32)
    offs = list(itertools.product((0, 1), repeat=d))
    consts = np.asarray(
        [
            sum(int(o[dd]) * int(strides[dd]) for dd in range(d) if iw.shape[dd] >= 2)
            for o in offs
        ],
        np.int32,
    )
    perm = np.argsort(base, kind="stable").astype(np.int32)
    inv_perm = np.empty(n, np.int32)
    inv_perm[perm] = np.arange(n, dtype=np.int32)
    base_sorted = base[perm]
    ws_h = [w_h[dd][perm] for dd in range(d)]
    w_pts_sorted = np.empty((2**d, n), w_h[0].dtype)
    for k, o in enumerate(offs):
        w = ws_h[0][:, o[0]].copy()
        for dd in range(1, d):
            w *= ws_h[dd][:, o[dd]]
        w_pts_sorted[k] = w
    nz = w_pts_sorted != 0
    cnt_k = nz.sum(axis=1)
    L = int(cnt_k.sum())
    flat_u = np.empty(L, np.int32)
    w_u = np.empty(L, w_pts_sorted.dtype)
    src_u = np.empty(L, np.int32)
    rank_u = np.empty(L, np.int32)
    idxn = np.arange(n, dtype=np.int64)
    within0 = None
    if n:
        newseg0 = np.empty(n, bool)
        newseg0[0] = True
        np.not_equal(base_sorted[1:], base_sorted[:-1], out=newseg0[1:])
        within0 = idxn - np.maximum.accumulate(np.where(newseg0, idxn, 0))
    counts_base = np.bincount(base_sorted, minlength=M).astype(np.int64)
    ar = np.arange(n, dtype=np.int32)
    # Running per-cell offsets; +smax slack lets each unpruned corner update
    # by one shifted slice-add of counts_base instead of a fresh bincount.
    cum = np.zeros(M + smax + 1, np.int64)
    pos = 0
    for k in range(2**d):
        Lk = int(cnt_k[k])
        if Lk == 0:
            continue
        ck = int(consts[k])
        sl = slice(pos, pos + Lk)
        pos += Lk
        if Lk == n:
            # No pruned entries: this corner shares base's segment structure.
            np.add(base_sorted, np.int32(ck), out=flat_u[sl])
            w_u[sl] = w_pts_sorted[k]
            src_u[sl] = ar
            rank_u[sl] = cum[flat_u[sl]] + within0
            cum[ck : ck + M] += counts_base
        else:
            nzk = nz[k]
            f = base_sorted[nzk] + np.int32(ck)
            flat_u[sl] = f
            w_u[sl] = w_pts_sorted[k][nzk]
            src_u[sl] = ar[nzk]
            il = np.arange(Lk, dtype=np.int64)
            ns = np.empty(Lk, bool)
            ns[0] = True
            np.not_equal(f[1:], f[:-1], out=ns[1:])
            within = il - np.maximum.accumulate(np.where(ns, il, 0))
            rank_u[sl] = cum[f] + within
            cum[:M] += np.bincount(f, minlength=M)
    counts = cum[:M].copy()
    hist = np.bincount(rank_u) if L else np.zeros(1, np.int64)
    tail = L - np.cumsum(hist)
    return CornerStream(
        base=base,
        consts=consts,
        perm=perm,
        inv_perm=inv_perm,
        base_sorted=base_sorted,
        w_pts_sorted=w_pts_sorted,
        flat_u=flat_u,
        w_u=w_u,
        src_u=src_u,
        rank_u=rank_u,
        counts=counts,
        tail=tail,
        shape=tuple(iw.shape),
    )


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


def build_interp_plan(
    iw: InterpWeights, max_slots: int = 64, stream: CornerStream | None = None
) -> InterpPlan:
    """Host-side (numpy) preprocessing of an :class:`InterpWeights` into a
    scatter-free :class:`InterpPlan`.  Not jittable; run once at model
    construction.  Pass ``stream`` (a :func:`build_corner_stream` result) to
    share the corner-update stream with the other plan builders — all the
    heavy work lives there; this function is then pure counting-sort fills.

    ``max_slots`` caps the ELL width ``K``; the actual ``K`` is chosen by a
    measured gather-vs-scatter break-even rule (grow while the overflow
    stream exceeds ~M/22 entries), capped at ``max_slots`` — excess
    contributions go to the overflow scatter stream, exact either way.
    The break-even rule self-limits, so the cap only matters at n ≳ m where
    mean contributions/cell = 2^d·n/M exceed it: an 8-cap at n=1M / m=1.05M
    left ~half the 16M corner updates on the 143M-elem/s scatter path
    (~0.1 s per matvec) where K≈20 slot columns gather them at 3.2G elem/s."""
    import numpy as np

    st = stream if stream is not None else build_corner_stream(iw)
    M = math.prod(st.shape)
    L = int(st.flat_u.shape[0])
    # Cell-major sorted stream by counting sort: position = cell_start + rank.
    cell_bounds = np.zeros(M + 1, np.int64)
    np.cumsum(st.counts, out=cell_bounds[1:])
    pos = cell_bounds[st.flat_u] + st.rank_u
    src_data = st.perm[st.src_u].astype(np.int64)  # data-order point ids
    src = np.empty(L, np.int64)
    src[pos] = src_data
    w_sorted = np.empty(L, st.w_u.dtype)
    w_sorted[pos] = st.w_u
    # Segment pointers: empty cells get start == end → exact 0 contribution
    # in the cumsum form (the pre-stream builder parked them at 0/0; any
    # equal pair is equivalent).
    node_start = cell_bounds[:M]
    node_end = cell_bounds[1:]

    # ELL width: measured on v5e, a slot column gathers B·M elements at
    # ~3.2G elem/s while an overflow entry scatters B elements at
    # ~143M elem/s — one more column pays for itself only while the overflow
    # stream holds > M·(143/3200) ≈ M/22 entries (RESULTS_r3.md §3).
    max_rank = len(st.tail)
    K = 1
    while K < min(max_rank, max_slots) and int(st.tail[K - 1]) > M // 22:
        K += 1
    in_slot = st.rank_u < K
    slot_src = np.zeros((M, K), dtype=np.int64)
    slot_w = np.zeros((M, K), dtype=st.w_u.dtype)
    slot_src[st.flat_u[in_slot], st.rank_u[in_slot]] = src_data[in_slot]
    slot_w[st.flat_u[in_slot], st.rank_u[in_slot]] = st.w_u[in_slot]
    ov = ~in_slot

    # Dense per-corner gather tables (data order, zero-weight corners kept):
    # flat = base + consts[k] exactly — see CornerStream.
    gather_flat = st.base[None, :].astype(np.int64) + st.consts[:, None]
    gather_w = st.w_pts_sorted[:, st.inv_perm]

    return InterpPlan(
        src_col=jnp.asarray(src, jnp.int32),
        w_sorted=jnp.asarray(w_sorted),
        start_ptr=jnp.asarray(node_start, jnp.int32),
        end_ptr=jnp.asarray(node_end, jnp.int32),
        gather_flat=jnp.asarray(gather_flat, jnp.int32),
        gather_w=jnp.asarray(gather_w),
        slot_src=jnp.asarray(slot_src, jnp.int32),
        slot_w=jnp.asarray(slot_w),
        ov_ids=jnp.asarray(st.flat_u[ov], jnp.int32),
        ov_src=jnp.asarray(src_data[ov], jnp.int32),
        ov_w=jnp.asarray(st.w_u[ov]),
        shape=tuple(st.shape),
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
    stream: CornerStream | None = None,
):
    """Host-side (numpy) tile-CSR preprocessing for :class:`OneHotPlan`.

    Returns ``None`` when the layout cannot win: a tile whose point window
    exceeds ``r_limit`` (pathologically clustered data would blow the VMEM
    ``(R, C)`` one-hot scratch), or a window gather no smaller than the ELL
    slot gather it replaces.  Callers fall back to
    :func:`interp_rmatvec_bm_exact`.  Pass ``stream`` to share the
    corner-update stream with the other plan builders.

    ``K`` grows until the overflow stream is tiny (≤ ~1k entries): unlike
    the ELL form — where each slot column is a ``B·M``-element gather — a
    slot layer here costs only a VPU compare pass, while each overflow
    entry is a serialized scatter-add (~63 ns·B on v5e).
    """
    import numpy as np

    st = stream if stream is not None else build_corner_stream(iw)
    M = math.prod(st.shape)
    n = int(st.base.shape[0])
    C = int(tile_cells)
    T = -(-M // C)
    M_pad = T * C
    L = int(st.flat_u.shape[0])

    # The design requires a TINY overflow (each entry is a ~22×-gather-cost
    # serialized scatter).  At n ≳ m the per-cell contribution count
    # (2^d·n/M) exceeds any reasonable K and the overflow explodes — at
    # n=1M / m=1.05M, K=8 left 7.9M of 16M updates on the scatter and the
    # kernel measured 2.4× SLOWER than the wide-ELL slot form
    # (benchmarks/exp_r5g_1m_matvec.py).  Fall back.  Capacity pre-gate
    # first: the K·M slots hold at most max_slots·M entries, so overflow is
    # at least L − max_slots·M regardless of how the points cluster.
    ov_cap = max(1000, M // 100) if ov_limit is None else int(ov_limit)
    if L - max_slots * M > ov_cap:
        return None

    max_rank = len(st.tail)
    K = 1
    while K < min(max_rank, max_slots) and int(st.tail[K - 1]) > 1000:
        K += 1
    in_slot = st.rank_u < K
    if int(st.tail[K - 1]) > ov_cap:
        return None

    flat_in = st.flat_u[in_slot].astype(np.int64)
    src_data = st.perm[st.src_u].astype(np.int64)  # data-order point ids
    src_in = src_data[in_slot]
    rank_in = st.rank_u[in_slot]
    tile_in = flat_in // C
    cell_local_in = flat_in - tile_in * C
    # Unique (tile, point) pairs among slot entries → per-tile point windows.
    key = tile_in * (n + 1) + src_in
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
    slot_w = np.zeros((T, K, C), st.w_u.dtype)
    slot_loc[tile_in, rank_in, cell_local_in] = local_r
    slot_w[tile_in, rank_in, cell_local_in] = st.w_u[in_slot]
    ov = ~in_slot
    return OneHotPlan(
        win_src=jnp.asarray(win_src.reshape(-1), jnp.int32),
        slot_loc=jnp.asarray(slot_loc, jnp.int32),
        slot_w=jnp.asarray(slot_w),
        ov_ids=jnp.asarray(st.flat_u[ov], jnp.int32),
        ov_src=jnp.asarray(src_data[ov], jnp.int32),
        ov_w=jnp.asarray(st.w_u[ov]),
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
