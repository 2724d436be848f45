"""bf16 solver state / bf16 matvec inputs in the whitened lattice dual at 1M.

RESULTS_r9 §6 lead: the dual training hot loop runs 14.7 ms/iter at B=8,
M=32⁴ — 2 X3 slab Kron matvecs (~4.5 ms) + stencil (~1.2 ms) + f32 state
traffic (axpy chains, reductions, diag scalings).  Three operating points
for the segmented-CG step:

  A. f32 state, X3 slab matvecs        (today's default)
  B. bf16 carried r/p state            (r4 pattern: carried state traffic
                                        halves, all arithmetic f32; the
                                        matvec sees a bf16 input only at
                                        its first read)
  C. B + bf16 matvec INPUTS            (each kron pass runs one bf16 MXU
                                        dot — operator error ~2.5e-3; CG
                                        stagnates there, which may be fine
                                        for surrogate TRAINING gradients)

Measures per-iteration wall (slope between 25- and 100-iter jitted
segments; scalar fetch syncs through the axon relay) and accuracy: the
TRUE whitened residual of 200-iter solves (exact-HIGHEST operator) plus
the training quadratic form (Wᵀy)ᵀγ vs variant A.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r11_bf16_dual.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression
from gp_grief_tpu.ops.batching import safe_batch_op
from gp_grief_tpu.ops.cg import _make_pcg_step, _reducers
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.utils.closure import explicit_closure

_colsum, _colnorm, _bc = _reducers("bm", None)


def make_white_c(m, Qs, wjs):
    """Variant C ops: _make_lattice_ops' exact structure (white(ṽ) = ṽ +
    to_dual(WᵀW·u − c̄u), u = from_dual(ṽ)) with every Kron matvec input
    cast bf16 — the slab then runs one bf16 MXU dot per pass.  Diagonal
    scalings, the stencil, and all CG arithmetic stay f32."""
    QsT = tuple(Q.T for Q in Qs)
    prec = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    wtw = m._wtw_bm_op()
    cbar = m._lattice_cbar()

    def to_dual(v_bm):
        B = v_bm.shape[0]
        eyeB = jnp.eye(B, dtype=jnp.bfloat16)
        t = kron_matvec_fast(
            (eyeB, *QsT), v_bm.reshape(-1).astype(jnp.bfloat16), precision=prec
        ).reshape(B, -1)
        return t.astype(jnp.float32) * wjs[None, :]

    def from_dual(v_bm):
        B = v_bm.shape[0]
        eyeB = jnp.eye(B, dtype=jnp.bfloat16)
        t = (v_bm * wjs[None, :]).reshape(-1).astype(jnp.bfloat16)
        return kron_matvec_fast(
            (eyeB, *Qs), t, precision=prec
        ).reshape(B, -1).astype(jnp.float32)

    def white(v_bm):
        u = from_dual(v_bm)
        return v_bm + to_dual(wtw(u) - cbar * u)

    return safe_batch_op(to_dual), safe_batch_op(from_dual), safe_batch_op(white)


def seg_prog(white, segment_iters, state_dtype=None):
    """`segment_iters`-iteration CG scan on (B, M) bm state.  State enters
    and leaves f32; with state_dtype the scan CARRIES r/p in that dtype
    (the ops/cg.py _cg_fixed mixed16 pattern)."""
    wd = jnp.float32
    sd = None if state_dtype is None else jnp.dtype(state_dtype)

    def seg(state):
        if sd is None:
            step = _make_pcg_step(white, lambda rr: rr, _colsum, _bc)

            def body(s, _):
                return step(*s), None

            state, _ = lax.scan(body, state, None, length=segment_iters)
            return state
        x, r, z, p, rz, dead = state
        _st = lambda a: a.astype(sd)  # noqa: E731

        def body(s, _):
            x, r, p, rz, dead = s
            Ap = white(p)
            p32 = p.astype(wd)
            Ap32 = Ap.astype(wd)
            pAp = _colsum(p32 * Ap32)
            ok = (pAp > 0) & (rz > 0) & jnp.isfinite(pAp) & jnp.isfinite(rz) & ~dead
            alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
            x = x + _bc(alpha) * p32
            r32 = r.astype(wd) - _bc(alpha) * Ap32
            rz_new = _colsum(r32 * r32)
            dead = dead | ~ok | ~jnp.isfinite(rz_new)
            beta = jnp.where(
                dead | (rz == 0), 0.0, rz_new / jnp.where(rz == 0, 1.0, rz)
            )
            p_new = _st(r32 + _bc(beta) * p32)
            return (x, _st(r32), p_new, rz_new, dead), None

        (x, r_s, p_s, rz, dead), _ = lax.scan(
            body, (x, _st(r), _st(p), rz, dead), None, length=segment_iters
        )
        r = r_s.astype(wd)
        return (x, r, r, p_s.astype(wd), rz, dead)

    return seg


def init_state(rhs):
    x0 = jnp.zeros_like(rhs)
    rz0 = _colsum(rhs * rhs)
    return (x0, rhs, rhs, rhs, rz0, jnp.zeros(rz0.shape, bool))


def state_sds(rhs):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), init_state(rhs)
    )


def time_seg(label, white, rhs, sd):
    """Per-iter time from the 25 vs 100 iteration slope (3 reps, best)."""
    progs = {}
    for L in (25, 100):
        pure, consts = explicit_closure(seg_prog(white, L, sd), state_sds(rhs))
        progs[L] = (jax.jit(pure), consts)
    out = {}
    for L, (fn, consts) in progs.items():
        fn(consts, init_state(rhs))  # compile
        best = float("inf")
        for _ in range(3):
            st = init_state(rhs)
            t0 = time.perf_counter()
            st = fn(consts, st)
            float(st[4][0])  # scalar fetch = sync through the relay
            best = min(best, time.perf_counter() - t0)
        out[L] = best
    per_iter = (out[100] - out[25]) / 75.0
    print(
        f"{label}: 25it {out[25]:.3f} s, 100it {out[100]:.3f} s, "
        f"slope {per_iter * 1e3:.2f} ms/iter",
        flush=True,
    )
    return progs[100], per_iter


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d, ms = 4, (int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    y = (
        np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
        + 0.5 * x[:, 2] * x[:, 3]
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)
    xg = [np.linspace(-0.05, 1.05, ms, dtype=np.float32)[:, None]] * d
    t0 = time.time()
    m = GPSKIRegression(
        x, y, [make_kernel("rbf", lengthscale=0.3) for _ in range(d)], xg,
        noise_var=0.05, solver="lattice", num_probes=8, lanczos_iters=30,
        cg_iters=300, cg_tol=1e-6,
    )
    print(f"model build {time.time() - t0:.1f} s", flush=True)

    sigma2 = jnp.exp(m.params["log_noise"])
    factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=m.dim_noise_var)
    Qs, wjs, _ = m._lattice_spectra(factors, sigma2)
    to_dual, from_dual, white = m._make_lattice_ops(Qs, wjs)
    m._lattice_x3 = False
    _, _, white_exact = m._make_lattice_ops(Qs, wjs)
    m._lattice_x3 = True
    M = int(np.prod([int(g.shape[0]) for g in m.xg]))
    we_pure, we_consts = explicit_closure(
        lambda s: white_exact(s), jax.ShapeDtypeStruct((8, M), jnp.float32)
    )
    we_jit = jax.jit(we_pure)

    key = jax.random.PRNGKey(0)
    z = jax.random.rademacher(key, (7, M), dtype=jnp.float32)
    vt = to_dual(m._rmatvec_bm(m.y[None, :]))
    rhs = jnp.concatenate([vt, z], axis=0)  # (8, M)

    _, _, white_c = make_white_c(m, Qs, wjs)

    variants = [
        ("A f32 state / X3", white, None),
        ("B bf16 state / X3", white, jnp.bfloat16),
        ("C bf16 state+input", white_c, jnp.bfloat16),
    ]
    ref = None
    for label, op, sd in variants:
        (fn, consts), per_iter = time_seg(label, op, rhs, sd)
        st = init_state(rhs)
        for _ in range(2):  # 200 iters total
            st = fn(consts, st)
        g = st[0]
        res = rhs - we_jit(we_consts, g)
        rel = float(_colnorm(res)[0] / _colnorm(rhs)[0])
        quad = float(jnp.dot(vt[0], g[0]))
        if ref is None:
            ref = quad
        print(
            f"{label}: true rel resid (y row) {rel:.3e}, quad {quad:.6f} "
            f"(vs A {abs(quad - ref) / abs(ref):.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
