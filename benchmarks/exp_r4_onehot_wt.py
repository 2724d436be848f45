"""Round-4: one-hot-matmul Pallas kernel for the SKI `Wᵀ u` spread.

The exact ELL slot-gather form costs 17.0 ms at n=100k/m=32⁴/B=9 — almost
all of it the B·M·K-element XLA gather at ~3.2 G elem/s (RESULTS_r3.md §3).
Mosaic's `dynamic_gather` is single-vreg, so a VMEM-table gather kernel is
impossible — but the gather can be *re-expressed as a matmul*:

  tile the lattice into T tiles of C cells; the points contributing to one
  tile form a small set (~2^d·n·C/M ≈ 200).  Per tile:

      u_win (B, R)   = the tile's contributing point values   (one XLA
                       gather of T·R ≈ 4·n elements — 8× fewer than B·M·K)
      SW    (R, C)   = sparse weight matrix, built IN VMEM from the ELL
                       (K, C) loc/weight tables via K one-hot compares
      out   (B, C)   = u_win @ SW            (exact f32 MXU dot, HIGHEST)

  The gather becomes VPU compares + an MXU dot — both run at memory-bound
  speed instead of 3.2 G elem/s.  Exactness: each output cell sums its ≤K
  weighted contributions in f32 (zeros elsewhere), the same short sums the
  scatter-add form does — SLQ-safe, unlike the cumsum trick.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python -u benchmarks/exp_r4_onehot_wt.py [cpu]
"""

import itertools
import math
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def build_onehot_tiles(idx_h, w_h, shape, n, C=512, max_slots=8):
    """Host-side tile plan: per lattice tile of C cells, the unique
    contributing points (win_src) and per-cell ELL loc/weight tables.

    Returns dict with win_src (T, R), slot_loc/slot_w (T, K, C),
    overflow stream (ov_ids, ov_src, ov_w), and sizes."""
    d = len(shape)
    M = math.prod(shape)
    T = -(-M // C)
    M_pad = T * C
    flats, weights, srcs = [], [], []
    for offsets in itertools.product((0, 1), repeat=d):
        flat = None
        w = np.ones(n, dtype=np.float32)
        for dd, off in enumerate(offsets):
            comp = np.minimum(idx_h[dd] + off, shape[dd] - 1)
            flat = comp if flat is None else flat * shape[dd] + comp
            w = w * w_h[dd][:, off]
        flats.append(flat.astype(np.int64))
        weights.append(w)
        srcs.append(np.arange(n, dtype=np.int64))
    flat_all = np.concatenate(flats)
    w_all = np.concatenate(weights)
    src_all = np.concatenate(srcs)
    nz = w_all != 0
    flat_all, w_all, src_all = flat_all[nz], w_all[nz], src_all[nz]

    # rank of each entry within its cell (stable sort by cell)
    perm = np.argsort(flat_all, kind="stable")
    flat_s, w_s, src_s = flat_all[perm], w_all[perm], src_all[perm]
    uniq, seg_start = np.unique(flat_s, return_index=True)
    starts = np.zeros(M, np.int64)
    starts[uniq] = seg_start
    rank = np.arange(len(flat_s)) - starts[flat_s]
    max_rank = int(rank.max()) + 1 if len(rank) else 1
    # With the kernel, one more slot column costs ~a VPU compare pass
    # (~0.05 ms at this scale) while an overflow entry costs a serialized
    # scatter-add (~63 ns·B) — grow K while overflow exceeds ~1k entries.
    K = 1
    while K < min(max_rank, max_slots) and int(np.sum(rank >= K)) > 1000:
        K += 1
    in_slot = rank < K
    ov = ~in_slot

    tile = flat_s // C
    cell_local = flat_s - tile * C
    # unique (tile, point) pairs among slot entries -> per-tile point lists
    key = tile[in_slot] * (n + 1) + src_s[in_slot]
    uniq_key = np.unique(key)
    tile_of_key = uniq_key // (n + 1)
    src_of_key = uniq_key % (n + 1)
    tile_start = np.searchsorted(tile_of_key, np.arange(T + 1))
    counts = np.diff(tile_start)
    R_max = int(counts.max()) if len(counts) else 1
    R = max(128, -(-R_max // 128) * 128)
    win_src = np.full((T, R), n, np.int64)
    pos = np.arange(len(uniq_key)) - tile_start[tile_of_key]
    win_src[tile_of_key, pos] = src_of_key
    # entry -> local index in its tile's point list
    eidx = np.searchsorted(uniq_key, key)
    local_r = eidx - tile_start[tile_of_key[eidx]]
    slot_loc = np.full((T, K, C), R, np.int64)  # R = "no point" (out of iota range)
    slot_w = np.zeros((T, K, C), np.float32)
    slot_loc[tile[in_slot], rank[in_slot], cell_local[in_slot]] = local_r
    slot_w[tile[in_slot], rank[in_slot], cell_local[in_slot]] = w_s[in_slot]
    return dict(
        win_src=win_src.astype(np.int32),
        slot_loc=slot_loc.astype(np.int32),
        slot_w=slot_w,
        ov_ids=flat_s[ov].astype(np.int32),
        ov_src=src_s[ov].astype(np.int32),
        ov_w=w_s[ov].astype(np.float32),
        T=T, C=C, R=R, K=K, M=M, M_pad=M_pad, n=n,
    )


def make_onehot_rmatvec(tiles, interpret=False, dot_precision="HIGHEST"):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C, R, K = tiles["T"], tiles["C"], tiles["R"], tiles["K"]
    M, M_pad, n = tiles["M"], tiles["M_pad"], tiles["n"]
    win_src = jnp.asarray(tiles["win_src"].reshape(-1))
    slot_loc = jnp.asarray(tiles["slot_loc"])
    slot_w = jnp.asarray(tiles["slot_w"])
    ov_ids = jnp.asarray(tiles["ov_ids"])
    ov_src = jnp.asarray(tiles["ov_src"])
    ov_w = jnp.asarray(tiles["ov_w"])
    have_ov = int(tiles["ov_ids"].shape[0]) > 0

    def kernel(u_ref, loc_ref, w_ref, o_ref):
        u = u_ref[...]  # (B, R)
        iota = lax.broadcasted_iota(jnp.int32, (R, C), 0)
        SW = jnp.zeros((R, C), jnp.float32)
        for k in range(K):
            lk = loc_ref[0, k, :][None, :]  # (1, C)
            wk = w_ref[0, k, :][None, :]
            SW = SW + jnp.where(lk == iota, wk, 0.0)
        o_ref[...] = lax.dot_general(
            u, SW, (((1,), (0,)), ((), ())),
            precision=getattr(lax.Precision, dot_precision),
            preferred_element_type=jnp.float32,
        )

    def rmatvec(u_bm):
        B = u_bm.shape[0]
        u_pad = jnp.concatenate([u_bm, jnp.zeros((B, 1), u_bm.dtype)], axis=1)
        u_win = u_pad[:, win_src]  # (B, T*R) — the one gather
        out = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((B, R), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, C), lambda t: (0, t), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M_pad), jnp.float32),
            interpret=interpret,
        )(u_win, slot_loc, slot_w)
        out = out[:, :M]
        if have_ov:
            out = out.at[:, ov_ids].add(ov_w[None, :] * u_pad[:, ov_src])
        return out

    return rmatvec


def correctness_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gp_grief_tpu.ops.interp import (
        build_interp_plan, interp_rmatvec_bm_exact, interp_weights,
    )

    rng = np.random.default_rng(0)
    n, B = 700, 5
    shape = (8, 9, 7)
    xg = tuple(jnp.asarray(np.sort(rng.uniform(0, 1, m)))[:, None] for m in shape)
    x = rng.uniform(-0.05, 1.05, size=(n, 3)).astype(np.float32)
    # put some points exactly on grid nodes (zero-weight pruning path)
    x[:50, 0] = np.asarray(xg[0]).ravel()[2]
    iw = interp_weights(jnp.asarray(x), xg)
    plan = build_interp_plan(iw)
    u = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    ref = interp_rmatvec_bm_exact(plan, u)

    idx_h = [np.asarray(ix) for ix in iw.idx]
    w_h = [np.asarray(w) for w in iw.w]
    tiles = build_onehot_tiles(idx_h, w_h, shape, n, C=64, max_slots=8)
    print(f"cpu tiles: T={tiles['T']} C={tiles['C']} R={tiles['R']} K={tiles['K']} "
          f"ov={tiles['ov_ids'].shape[0]}")
    out = make_onehot_rmatvec(tiles, interpret=True)(u)
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print("cpu interpret rel err vs slot-exact:", err)
    assert err < 1e-6, err
    print("CPU CORRECTNESS OK")


def perf_tpu():
    import jax
    import jax.numpy as jnp
    from bench import _timed_loop
    from gp_grief_tpu.ops.interp import (
        build_interp_plan, interp_rmatvec_bm_exact, interp_weights,
    )

    rng = np.random.default_rng(0)
    n, d, md, B = 100_000, 4, 32, 9
    shape = (md,) * d
    x = rng.uniform(0, 4, size=(n, d)).astype(np.float32)
    # sort by base cell (the SKI model can pre-permute its data once)
    xg = tuple(jnp.asarray(np.linspace(0, 4, md, dtype="float32"))[:, None] for _ in range(d))
    iw = interp_weights(jnp.asarray(x), xg)
    idx_h = [np.asarray(ix) for ix in iw.idx]
    w_h = [np.asarray(w) for w in iw.w]

    plan = build_interp_plan(iw)
    u = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    ref = interp_rmatvec_bm_exact(plan, u)  # 16.94 ms measured (first run)

    cases = [
        # (C, max_slots, dot_precision, tag)
        (1024, 8, "HIGHEST", "base"),
        (2048, 8, "HIGHEST", "bigger tile"),
        (1024, 8, "DEFAULT", "bf16 dot (accuracy probe)"),
        (1024, 4, "HIGHEST", "K<=4, more overflow"),
    ]
    for C, ms_, prec, tag in cases:
        tiles = build_onehot_tiles(idx_h, w_h, shape, n, C=C, max_slots=ms_)
        fn = make_onehot_rmatvec(tiles, dot_precision=prec)
        out = fn(u)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        t = _timed_loop(lambda uu: fn(uu)[:, :n], u, iters=20)
        print(f"onehot C={C} K={tiles['K']} R={tiles['R']} ov={tiles['ov_ids'].shape[0]} "
              f"{prec:7s} [{tag}]: {t*1e3:8.2f} ms   rel err {err:.2e}")


if __name__ == "__main__":
    if "cpu" in sys.argv[1:]:
        correctness_cpu()
    else:
        perf_tpu()
