"""Debug: windowed applies return wrong values on TPU at scale?

exp_r6_ski_1m_e2e measured NLML = -4.76M at n=1M — consistent with
Wᵀy ≈ 0 — while every CPU test (oracle, model parity, segmented) passes.
Bisect on the real chip at n=200k / 16⁴ (fast build): compare the windowed
applies against the flat exact forms, with and without the custom_vjp
wrapper, and isolate scan/dynamic_slice vs one-big-gather variants.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r6_windowed_debug.py [n] [md]
"""

import sys

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gp_grief_tpu.ops.interp import (
    build_interp_plan,
    interp_matvec_bm_fast,
    interp_rmatvec_bm_exact,
    interp_weights,
)
from gp_grief_tpu.ops.interp_windowed import (
    _matvec_impl,
    _rmatvec_impl,
    build_windowed_plan,
    make_windowed_ops,
)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
    return f"rel={d:.3e}  |a|={np.linalg.norm(a):.4e} |b|={np.linalg.norm(b):.4e}"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    md = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    d = 4
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    xg = tuple(np.linspace(0, 4, md, dtype="float32")[:, None] for _ in range(d))
    M = md ** d
    iw = interp_weights(jnp.asarray(x), xg)
    plan = build_interp_plan(iw)
    wplan = build_windowed_plan(iw)
    print(f"n={n} M={M}  windowed: T={wplan.T} Wr={wplan.Wr} Tp={wplan.Tp} "
          f"Wc={wplan.Wc} K={wplan.wt_loc.shape[-1]} ov={wplan.ov_ids.shape[0]}",
          flush=True)

    B = 4
    u = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
    v = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))
    us = u[:, wplan.perm]

    ref_wt = jax.jit(lambda uu: interp_rmatvec_bm_exact(plan, uu))(u)
    ref_w = jax.jit(lambda vv: interp_matvec_bm_fast(plan, vv))(v)

    # 1. raw impls (no custom_vjp), jitted
    got_wt = jax.jit(lambda uu: _rmatvec_impl(wplan, uu))(us)
    print("Wt raw-impl   vs flat:", rel(got_wt, ref_wt), flush=True)
    got_w = jax.jit(lambda vv: _matvec_impl(wplan, vv))(v)
    got_w_data = got_w[:, wplan.inv_perm]
    print("W  raw-impl   vs flat:", rel(got_w_data, ref_w), flush=True)

    # 2. custom_vjp closures
    mv_s, rmv_s = make_windowed_ops(wplan)
    got_wt2 = jax.jit(rmv_s)(us)
    print("Wt custom-vjp vs flat:", rel(got_wt2, ref_wt), flush=True)

    # 3. scan WITHOUT dynamic_slice: gather from the full array with
    #    globalized indices (isolates dynamic_slice as the culprit)
    Cb, K, T, Wr = wplan.Cb, wplan.wt_loc.shape[-1], wplan.T, wplan.Wr

    def wt_noslice(uu):
        def body(_, inp):
            s, lc, w = inp
            gidx = (lc.reshape(-1).astype(jnp.int32) + s).astype(jnp.int32)
            g = uu[:, gidx].reshape(B, Cb, K)
            return _, jnp.sum(w[None] * g, axis=-1)

        _, blocks = lax.scan(body, 0, (wplan.wt_starts, wplan.wt_loc, wplan.wt_w))
        out = jnp.moveaxis(blocks, 1, 0).reshape(B, T * Cb)[:, :M]
        if int(wplan.ov_ids.shape[0]) > 0:
            out = out.at[:, wplan.ov_ids].add(
                wplan.ov_w[None, :] * uu[:, wplan.ov_src]
            )
        return out

    got_wt3 = jax.jit(wt_noslice)(us)
    print("Wt noslice    vs flat:", rel(got_wt3, ref_wt), flush=True)

    # 4. single block by hand (host loop, no scan) — first 2 blocks
    wt_starts = np.asarray(wplan.wt_starts)
    wt_loc = np.asarray(wplan.wt_loc)
    wt_w = np.asarray(wplan.wt_w)
    us_h = np.asarray(us)
    ref_h = np.asarray(ref_wt)
    for b in (0, wplan.T // 2):
        win = us_h[:, wt_starts[b]: wt_starts[b] + wplan.Wr]
        g = win[:, wt_loc[b].reshape(-1)].reshape(B, Cb, K)
        blk = (wt_w[b][None] * g).sum(-1)
        lo_c, hi_c = b * Cb, min((b + 1) * Cb, M)
        # overflow cells differ; mask them out of the check
        ov_mask = np.zeros(M, bool)
        ov_mask[np.asarray(wplan.ov_ids)] = True
        sl = ~ov_mask[lo_c:hi_c]
        dd = np.abs(blk[:, : hi_c - lo_c][:, sl] - ref_h[:, lo_c:hi_c][:, sl]).max()
        print(f"host block {b}: max abs diff (non-ov cells) {dd:.3e}", flush=True)


if __name__ == "__main__":
    main()
