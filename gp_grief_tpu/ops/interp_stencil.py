"""``WᵀW`` as a ``3^d``-offset lattice stencil (the n ≳ m hot-loop fusion).

The lattice-dual SKI operator's hot composition is ``Wᵀ(W(v))``
(:meth:`gp_grief_tpu.models.gp_ski.GPSKIRegression._make_lattice_ops`): both
halves are irregular point↔lattice maps whose TPU cost is gather-bound —
~95 ms per pair at n=1M, m=32⁴, B=8 even in the windowed form
(benchmarks/RESULTS_r8.md §5 concluded further gains need an MXU/structure
re-expression, not gather reshuffling).

This module removes the points from the loop entirely.  ``WᵀW`` is itself a
**lattice stencil**: ``(WᵀW)[c, c'] = Σ_i w_c(x_i)·w_{c'}(x_i)`` is nonzero
only when cells ``c, c'`` are corners of a common data cell, i.e.
``c' − c ∈ {−1, 0, 1}^d`` in grid coordinates — at most ``3^d`` flat-index
offsets ``δ``.  Precomputing per-offset coefficient tables

    A_δ[c] = Σ_i w_c(x_i) · w_{c+δ}(x_i)            (host, once per model)

turns the apply into ``out[c] = Σ_δ A_δ[c] · v[c + δ]`` — ``D ≤ 3^d``
shifted multiply-adds over the lattice, pure VPU + sequential HBM reads, no
gathers, no scatters, and **no dependence on the kernel hyperparameters**
(``W`` is geometry-only), so the tables never rebuild during training.

Flat-shift safety: every corner's flat index is exactly ``base + const``
(:class:`gp_grief_tpu.ops.interp.CornerStream` invariant: ``interp_weights``
clamps ``left ≤ m_d − 2`` and zero-weights degenerate dims), so a table
entry exists only where ``c`` and ``c + δ`` are corners of one real point's
cell.  Cells where a flat shift would wrap across a dimension boundary get
``A_δ[c] = 0`` — the apply can read plain flat shifts of a zero-padded ``v``
with no validity masks.

Cost at n=1M, m=32⁴, B=16 (f32): tables ``81·M·4B = 340 MB`` read per
apply (~1 ms at the measured Pallas pass floor) + ``81·B·M`` multiply-adds
(~2 ms VPU) + 3 overlapping windows of ``v`` (~0.8 ms) — ~20× the windowed
gather pair, and independent of how the points cluster.

Reference parity note: the reference has no counterpart (its SKI-style ``W``
composition is SURVEY.md §2 #2/#4 sparse products); this is a TPU
memory-system redesign of the same operator product.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu.ops.interp import CornerStream, InterpWeights, build_corner_stream

__all__ = [
    "WtWStencil",
    "build_wtw_stencil",
    "make_wtw_stencil_op",
    "wtw_stencil_bm",
]


class WtWStencil(NamedTuple):
    """Static stencil form of ``WᵀW`` (host-built, geometry-only).

    ``tables (D, M)``: coefficient rows, one per flat-index offset;
    ``deltas (D,)`` static ascending flat shifts; ``d0s (D,)`` each offset's
    leading-dimension component (−1/0/1; drives the 3-window blocking);
    ``shape`` the grid shape.
    """

    tables: jax.Array
    deltas: Tuple[int, ...]
    d0s: Tuple[int, ...]
    shape: Tuple[int, ...]

    @property
    def M(self) -> int:
        return math.prod(self.shape)


def build_wtw_stencil(
    iw: InterpWeights,
    stream: CornerStream | None = None,
    *,
    dtype=None,
    max_table_bytes: int = 1 << 31,
) -> WtWStencil | None:
    """Host-side (numpy, f64 accumulation) stencil build.

    Returns ``None`` when the table memory ``D·M·itemsize`` would exceed
    ``max_table_bytes`` or the pair enumeration ``4^d`` is unreasonable
    (d > 6) — callers keep the windowed/ELL point-space applies then.
    Pass ``stream`` to share the model's :class:`CornerStream`.
    """
    d = len(iw.shape)
    if 4**d > 4096:  # d > 6: table count and build cost both explode
        return None
    st = stream if stream is not None else build_corner_stream(iw)
    M = math.prod(st.shape)
    consts = np.asarray(st.consts, np.int64)
    base_sorted = np.asarray(st.base_sorted, np.int64)
    w_sorted = np.asarray(st.w_pts_sorted)
    nc = consts.shape[0]
    if dtype is None:
        dtype = w_sorted.dtype
    # Distinct offsets bound: ≤ 3^(non-degenerate dims).  Capacity gate
    # before doing any O(4^d · n) work.
    d_eff = sum(1 for m in iw.shape if m >= 2)
    D_bound = 3**d_eff
    if D_bound * M * np.dtype(dtype).itemsize > max_table_bytes:
        return None

    # off0 per corner: the leading-dimension offset actually encoded in the
    # const (0 for degenerate dim 0, matching build_corner_stream).
    offs = [
        tuple((k >> (d - 1 - dd)) & 1 for dd in range(d)) for k in range(nc)
    ]
    off0 = np.asarray(
        [o[0] if iw.shape[0] >= 2 else 0 for o in offs], np.int64
    )
    nonzero_k = [bool(np.any(w_sorted[k])) for k in range(nc)]

    # Symmetry halves the accumulation: (WᵀW)ᵀ = WᵀW ⟹
    # A_{-δ}[c] = (WᵀW)[c, c−δ] = A_δ[c−δ] — every negative-offset table is
    # a zero-filled flat right-shift of its positive sibling, so only pairs
    # with δ = consts[kp] − consts[k] ≥ 0 are accumulated directly.
    pairs = [
        (k, kp, int(consts[kp] - consts[k]), int(off0[kp] - off0[k]))
        for k in range(nc)
        if nonzero_k[k]
        for kp in range(nc)
        if nonzero_k[kp] and consts[kp] >= consts[k]
    ]
    d0_of: dict[int, int] = {}
    for _, _, delta, d0 in pairs:
        d0_of.setdefault(delta, d0)
        d0_of.setdefault(-delta, -d0)
    deltas_pos = sorted({delta for _, _, delta, _ in pairs})

    on_device = jax.default_backend() in ("tpu", "axon")
    if pairs and on_device and len(pairs) * w_sorted.shape[1] >= (1 << 25):
        # Device build: ONE jitted fori_loop of per-pair n-element
        # scatter-adds (XLA TPU scatter ≈ 143M elem/s, RESULTS_r3.md) —
        # ~1 s at n=1M/32⁴ where the host bincount loop took ~200 s.
        # Data-sized operands ride as program ARGUMENTS (closure-capture
        # rule, utils/closure.py docs); the tables never leave the device.
        cand = sorted({s * dl for dl in deltas_pos for s in (1, -1)})
        tables, keep = _build_tables_device(
            base_sorted, w_sorted, consts, pairs, deltas_pos, cand, M, dtype
        )
        keep = np.asarray(keep)
        deltas = [dl for dl, kp_ in zip(cand, keep) if kp_]
        if not deltas:
            deltas = [0]
            tables = jnp.zeros((1, M), dtype)
        else:
            tables = tables[np.flatnonzero(keep)]
        return WtWStencil(
            tables=tables,
            deltas=tuple(deltas),
            d0s=tuple(int(d0_of[dl]) for dl in deltas),
            shape=tuple(st.shape),
        )

    acc: dict[int, np.ndarray] = {}
    for k, kp, delta, _ in pairs:
        wprod = (w_sorted[k] * w_sorted[kp]).astype(np.float64)
        if not np.any(wprod):
            continue
        tab = np.bincount(base_sorted + consts[k], weights=wprod, minlength=M)
        if delta in acc:
            acc[delta] += tab
        else:
            acc[delta] = tab
    for delta in list(acc):
        if delta > 0:
            acc[-delta] = np.concatenate(
                [np.zeros(delta), acc[delta][: M - delta]]
            )
    deltas = sorted(dl for dl, tab in acc.items() if np.any(tab))
    if not deltas:  # n == 0 degenerate
        deltas = [0]
        acc[0] = np.zeros(M)
        d0_of[0] = 0
    tables = np.stack([acc[dl] for dl in deltas]).astype(dtype)
    return WtWStencil(
        tables=jnp.asarray(tables),
        deltas=tuple(int(dl) for dl in deltas),
        d0s=tuple(int(d0_of[dl]) for dl in deltas),
        shape=tuple(st.shape),
    )


def _build_tables_device(
    base_sorted, w_sorted, consts, pairs, deltas_pos, cand, M, dtype
):
    """Whole table build as ONE jitted device program (eager per-delta ops
    each cost a relay dispatch + compile on the remote TPU — measured 97 s
    for ~85 of them): δ ≥ 0 scatter-add accumulation into a flat
    ``(D⁺·M,)`` buffer, negative rows derived by the symmetry shift, plus
    the per-row keep mask.  f32 accumulation (per-cell contribution counts
    are ~n/M·2^d — far below f32's ~2^24 integer grain, and the operator
    feeds f32 CG anyway)."""
    row_of = {dl: i for i, dl in enumerate(deltas_pos)}
    k_idx = jnp.asarray([k for k, _, _, _ in pairs], jnp.int32)
    kp_idx = jnp.asarray([kp for _, kp, _, _ in pairs], jnp.int32)
    offset = jnp.asarray(
        [row_of[delta] * M + int(consts[k]) for k, _, delta, _ in pairs],
        jnp.int32,
    )
    P, D = len(pairs), len(deltas_pos)

    def build(base, w):
        def body(p, out):
            wprod = w[k_idx[p]] * w[kp_idx[p]]
            return out.at[base + offset[p]].add(wprod)

        pos = jax.lax.fori_loop(
            0, P, body, jnp.zeros((D * M,), w.dtype)
        ).reshape(D, M)
        rows = []
        for dl in cand:
            if dl >= 0:
                rows.append(pos[row_of[dl]])
            else:  # A_{-δ}[c] = A_δ[c − δ]: zero-filled flat right-shift
                rows.append(
                    jnp.concatenate(
                        [jnp.zeros((-dl,), pos.dtype), pos[row_of[-dl], : M + dl]]
                    )
                )
        tables = jnp.stack(rows).astype(dtype)
        return tables, jnp.any(tables != 0, axis=1)

    return jax.jit(build)(
        jnp.asarray(base_sorted, jnp.int32),
        jnp.asarray(w_sorted, jnp.float32),
    )


# --------------------------------------------------------------------------
# Apply
# --------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_ACC_GROUP = 8
"""Stencil terms accumulated in registers between out-ref flushes (bounds
Mosaic scoped-vmem stack liveness; see the kernel comment)."""


def _apply_xla(statics, tables, v_bm):
    """Reference XLA apply: pad + D static shifted multiply-adds.

    Correct everywhere (CPU f64 tests, tiny grids, fallback); on TPU at
    large M the fusion re-reads ``v`` once per offset, so the Pallas path
    below is the production form.
    """
    deltas, _, shape, _, _ = statics
    M = math.prod(shape)
    S = max(1, max(abs(dl) for dl in deltas))
    vp = jnp.pad(v_bm, ((0, 0), (S, S)))
    out = jnp.zeros_like(v_bm)
    for i, dl in enumerate(deltas):
        out = out + tables[i][None, :] * jax.lax.slice_in_dim(
            vp, S + dl, S + dl + M, axis=1
        )
    return out


def _plan_windows(statics, B: int, itemsize: int):
    """Static window planning for the Pallas apply.

    Returns ``(C, fs, off_f, o_of_delta, Wv, Z, N_pad)``: block cells,
    active leading-offset groups, per-group aligned window start offsets
    (start of group ``f`` at block ``t`` is ``t·C + off_f[f]`` into the
    padded ``v``), per-delta static in-window read offsets, window width,
    left pad, and padded length.
    """
    deltas, d0s, shape, block_cells, _ = statics
    M = math.prod(shape)
    stride0 = math.prod(shape[1:]) if len(shape) > 1 else 1
    fs = sorted(set(d0s))
    S_rest = max(abs(dl - f * stride0) for dl, f in zip(deltas, d0s))
    S_full = max(abs(dl) for dl in deltas)
    # Window split only pays when the leading-dim groups are far apart
    # relative to the block: otherwise one window covering all offsets is
    # less total DMA.
    split = len(fs) > 1 and stride0 > (block_cells + 2 * S_rest)
    if not split:
        fs = [0]
        S_rest = S_full
        d0s = tuple(0 for _ in deltas)
    C = int(block_cells)
    T = -(-M // C)
    M_pad = T * C
    Z = _round_up(stride0 * max((-min(fs)), 0) + S_rest, 128)
    Wv = _round_up(C + 2 * S_rest + 256, 128)
    off_f = {}
    o_of_delta = []
    for f in fs:
        base_off = f * stride0 - S_rest + Z
        align = base_off % 128
        off_f[f] = base_off - align
    for dl, f in zip(deltas, d0s):
        o = (dl - f * stride0) + S_rest + (f * stride0 - S_rest + Z) % 128
        o_of_delta.append((f, int(o)))
        assert 0 <= o and o + C <= Wv, (dl, f, o, Wv)
    N_pad = max(off_f[f] + (T - 1) * C + Wv for f in fs)
    Bp = _round_up(max(B, 1), 8)  # sublane padding
    Dp = _round_up(len(deltas), 8)
    vmem = (
        len(fs) * Bp * Wv * itemsize  # windows
        + 2 * Dp * C * itemsize  # double-buffered table blocks
        + 2 * Bp * C * itemsize  # out block (double-buffered)
        + (_ACC_GROUP + 2) * Bp * C * itemsize  # live product temporaries
    )
    return C, fs, off_f, o_of_delta, Wv, Z, N_pad, M_pad, T, vmem


def _apply_pallas(statics, tables, v_bm):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    deltas, d0s, shape, block_cells, interpret = statics
    M = math.prod(shape)
    # Large batches (predict pushes (c, M) test chunks through WᵀW) are
    # slabbed: VMEM liveness scales with B·C, so past 128 rows no block
    # size fits the scoped limit.  Tables re-read once per slab — a
    # once-per-predict precompute cost, not a training hot-loop one.
    B_in = v_bm.shape[0]
    if B_in > 128:
        return jnp.concatenate(
            [
                _apply_pallas(statics, tables, v_bm[i : i + 128])
                for i in range(0, B_in, 128)
            ],
            axis=0,
        )
    # Mosaic sublane alignment: the manual window DMA slices B rows, which
    # must be a multiple of the (8, 128) tile's sublane count (measured: B=5
    # fails at "Slice shape along dimension 0 must be aligned to tiling (8)").
    if B_in % 8:
        v_bm = jnp.pad(v_bm, ((0, 8 - B_in % 8), (0, 0)))
    B = v_bm.shape[0]
    itemsize = jnp.dtype(v_bm.dtype).itemsize
    C = int(block_cells)
    plan = _plan_windows((deltas, d0s, shape, C, interpret), B, itemsize)
    while plan[-1] > 12 * 1024 * 1024 and C > 128:
        C //= 2
        plan = _plan_windows((deltas, d0s, shape, C, interpret), B, itemsize)
    if plan[-1] > 14 * 1024 * 1024:
        # No fitting block plan (huge D·B at tiny grids) — correctness first.
        return _apply_xla(statics, tables, v_bm)[:B_in]
    C, fs, off_f, o_of_delta, Wv, Z, N_pad, M_pad, T, _ = plan
    D = len(deltas)

    v_pad = jnp.zeros((B, N_pad), v_bm.dtype).at[:, Z : Z + M].set(v_bm)
    tab_pad = (
        tables
        if M_pad == M
        else jnp.pad(tables, ((0, 0), (0, M_pad - M)))
    ).astype(v_bm.dtype)
    starts = [int(off_f[f]) for f in fs]
    nf = len(fs)

    def kernel(v_ref, tab_ref, out_ref, win_ref, sem_ref):
        t = pl.program_id(0)
        copies = []
        for fi in range(nf):
            cp = pltpu.make_async_copy(
                v_ref.at[:, pl.ds(t * C + starts[fi], Wv)],
                win_ref.at[fi],
                sem_ref.at[fi],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()
        # Grouped accumulation flushed through the out ref: a single fully
        # unrolled 81-term sum keeps every product temporary live on the
        # Mosaic stack (measured 17.7 MB scoped-vmem OOM at D=81, C=8192) —
        # bounding the group caps liveness at ~_ACC_GROUP blocks.
        for g0 in range(0, D, _ACC_GROUP):
            part = None
            for i in range(g0, min(g0 + _ACC_GROUP, D)):
                f, o = o_of_delta[i]
                term = (
                    tab_ref[i, :][None, :]
                    * win_ref[fs.index(f), :, o : o + C]
                )
                part = term if part is None else part + term
            out_ref[...] = part if g0 == 0 else out_ref[...] + part

    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((D, C), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M_pad), v_bm.dtype),
        scratch_shapes=[
            pltpu.VMEM((nf, B, Wv), v_bm.dtype),
            pltpu.SemaphoreType.DMA((nf,)),
        ],
        interpret=bool(interpret),
    )(v_pad, tab_pad)
    return out[:B_in, :M]


def _impl(statics, arrays, v_bm):
    (tables,) = arrays
    interpret = statics[4]
    if interpret is True:
        return _apply_pallas(statics, tables, v_bm)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (interpret is False or on_tpu) and math.prod(statics[2]) >= 1 << 14:
        return _apply_pallas(statics, tables, v_bm)
    return _apply_xla(statics, tables, v_bm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _wtw_p(statics, arrays, v_bm):
    return _impl(statics, arrays, v_bm)


def _wtw_fwd(statics, arrays, v_bm):
    return _impl(statics, arrays, v_bm), arrays


def _wtw_bwd(statics, arrays, ct):
    # WᵀW is symmetric: the VJP in v is the same stencil on the cotangent.
    # Table cotangents are structurally required but unused in training
    # (geometry-only): zeros, DCE'd by XLA when not requested.
    zeros = tuple(jnp.zeros_like(a) for a in arrays)
    return (zeros, _impl(statics, arrays, ct))


_wtw_p.defvjp(_wtw_fwd, _wtw_bwd)


def wtw_stencil_bm(
    st: WtWStencil,
    v_bm: jax.Array,
    *,
    block_cells: int = 8192,
    interpret: bool | None = None,
) -> jax.Array:
    """Apply ``WᵀW`` to batch-major lattice vectors: ``(B, M) → (B, M)``.

    Differentiable (self-adjoint custom VJP).  ``interpret=None`` picks the
    Pallas kernel on TPU and the XLA shifted-add form elsewhere;
    ``interpret=True`` forces the Pallas path in interpreter mode (tests).
    """
    statics = (st.deltas, st.d0s, st.shape, int(block_cells), interpret)
    return _wtw_p(statics, (st.tables,), v_bm)


def make_wtw_stencil_op(st: WtWStencil, **kw):
    """Closure form of :func:`wtw_stencil_bm` for solver plumbing; the table
    array rides as a custom-VJP operand (hoistable by
    :func:`gp_grief_tpu.utils.closure.explicit_closure`)."""

    def wtw(v_bm):
        return wtw_stencil_bm(st, v_bm, **kw)

    return wtw
