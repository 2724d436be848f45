"""Round-3: replace the SKI Wᵀ scatter-add (99% of the SKI matvec).

interp_rmatvec_bm does 2^d scatter-adds; measured 101 ms at n=100k, m=1.05M,
B=9 vs 1 ms for the whole Kron matvec.  Candidates (all reuse a static
index preprocessing — the interpolation pattern is fixed per model):

  A. current: 2^d separate `at[:, flat_c].add`
  B. one concatenated scatter (16n updates in one op)
  C. pre-sorted indices + `indices_are_sorted=True`
  D. `jax.ops.segment_sum` on the sorted stream
  E. cumsum-diff: cumsum the sorted value stream, take boundary differences,
     write with a UNIQUE-index scatter (collision-free)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_scatter.py
"""

import itertools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_loop
from gp_grief_tpu.ops.interp import _corner_flat_idx, interp_rmatvec_bm, interp_weights


def main():
    rng = np.random.default_rng(0)
    n, d, md = 100_000, 4, 32
    M = md**d
    B = 9
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    xg = tuple(jnp.asarray(np.linspace(0, 4, md, dtype="float32"))[:, None] for _ in range(d))
    iw = interp_weights(jnp.asarray(x), xg)

    # Static preprocessing (host, once per model).
    flats, weights = [], []
    for offsets in itertools.product((0, 1), repeat=d):
        flats.append(np.asarray(_corner_flat_idx(iw, offsets)))
        w = np.ones(n, dtype="float32")
        for dd, off in enumerate(offsets):
            w = w * np.asarray(iw.w[dd][:, off])
        weights.append(w)
    flat_all = np.concatenate(flats)          # (16n,)
    w_all = np.concatenate(weights)           # (16n,)
    perm = np.argsort(flat_all, kind="stable")
    sorted_ids = flat_all[perm]
    sorted_w = w_all[perm]
    # segment boundaries for the cumsum-diff variant
    uniq_ids, seg_starts = np.unique(sorted_ids, return_index=True)
    seg_ends = np.concatenate([seg_starts[1:], [len(sorted_ids)]]) - 1  # inclusive

    flat_all, w_all = jnp.asarray(flat_all), jnp.asarray(w_all)
    perm_j = jnp.asarray(perm)
    sorted_ids_j = jnp.asarray(sorted_ids)
    sorted_w_j = jnp.asarray(sorted_w)
    uniq_j, starts_j, ends_j = map(jnp.asarray, (uniq_ids, seg_starts, seg_ends))
    src_col = jnp.asarray(np.concatenate([np.arange(n)] * (2 ** d))[perm])

    v = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))

    def chainable(fn):
        # (B, n) -> (B, M) -> slice back to (B, n) so _timed_loop can chain.
        return lambda vv: fn(vv)[:, :n]

    def variant_A(vv):
        return interp_rmatvec_bm(iw, vv)

    def variant_B(vv):
        vals = w_all[None, :] * jnp.concatenate([vv] * (2 ** d), axis=1)
        return jnp.zeros((B, M), vv.dtype).at[:, flat_all].add(vals)

    def variant_C(vv):
        vals = sorted_w_j[None, :] * vv[:, src_col]
        return jnp.zeros((B, M), vv.dtype).at[:, sorted_ids_j].add(
            vals, indices_are_sorted=True
        )

    def variant_D(vv):
        vals = sorted_w_j[None, :] * vv[:, src_col]
        seg = jax.vmap(
            lambda row: jax.ops.segment_sum(
                row, sorted_ids_j, num_segments=M, indices_are_sorted=True
            )
        )(vals)
        return seg

    def variant_E(vv):
        vals = sorted_w_j[None, :] * vv[:, src_col]       # (B, 16n) sorted stream
        cs = jnp.cumsum(vals, axis=1)
        seg = cs[:, ends_j] - jnp.where(
            (starts_j == 0)[None, :], 0.0, cs[:, jnp.maximum(starts_j - 1, 0)]
        )
        return jnp.zeros((B, M), vv.dtype).at[:, uniq_j].set(
            seg, indices_are_sorted=True, unique_indices=True
        )

    # F: fully scatter-free — static per-node segment pointers into the
    # sorted stream; out[:, j] = cs0[:, end_ptr[j]] - cs0[:, start_ptr[j]]
    # (empty nodes have end_ptr == start_ptr → exact 0).
    node_start = np.zeros(M, dtype=np.int64)
    node_end = np.zeros(M, dtype=np.int64)
    node_start[uniq_ids] = seg_starts
    node_end[uniq_ids] = seg_ends + 1
    # empty nodes: point both at 0 (already true via zeros init)
    start_ptr = jnp.asarray(node_start, jnp.int32)
    end_ptr = jnp.asarray(node_end, jnp.int32)

    def variant_F(vv):
        vals = sorted_w_j[None, :] * vv[:, src_col]
        cs0 = jnp.concatenate(
            [jnp.zeros((B, 1), vv.dtype), jnp.cumsum(vals, axis=1)], axis=1
        )
        return cs0[:, end_ptr] - cs0[:, start_ptr]

    # G: padded per-node slots (ELL) — EXACT; production implementation.
    from gp_grief_tpu.ops.interp import build_interp_plan, interp_rmatvec_bm_exact

    plan = build_interp_plan(iw)
    print(f"  [G] K={plan.slot_w.shape[1]}, overflow={plan.ov_ids.shape[0]}", flush=True)

    def variant_G(vv):
        return interp_rmatvec_bm_exact(plan, vv)

    ref = variant_A(v)
    variants = [("A current", variant_A), ("B one-scatter", variant_B),
                ("C sorted-scatter", variant_C), ("D segment_sum", variant_D),
                ("E cumsum-diff", variant_E), ("F ptr-gather", variant_F),
                ("G slot-gather", variant_G)]
    if "--fg-only" in sys.argv:  # B-E already measured (RESULTS_r3): skip compiles
        variants = [v for v in variants if v[0][0] in "AFG"]
    for name, fn in variants:
        out = fn(v)
        rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-30))
        t = _timed_loop(chainable(fn), v, iters=10)
        print(f"{name:18s} {t*1e3:9.2f} ms   rel-vs-A {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
