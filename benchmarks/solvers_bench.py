"""CG + Lanczos solve-time tracker (BASELINE.json:2 "CG+Lanczos solve time").

Times the iterative stack on the grid-structured operator (⊗K_d + σ²I) at a
bandwidth-relevant size: batched CG solve (32 rhs), single-vector CG, and SLQ
log-det — one JSON line each with iterations and wall time.  Slope-timing per
bench.py (the axon tunnel does not sync on block_until_ready).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(m_d: int = 32, d: int = 5, sigma2: float = 0.5):
    import jax
    import jax.numpy as jnp

    from gp_grief_tpu.ops import cg_solve, group_factors, kron_matvec_fast, slq_logdet

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    m = m_d**d
    # PSD factors with unit-ish scale: K_d = A Aᵀ / m_d + I.
    factors = []
    for _ in range(d):
        A = rng.standard_normal((m_d, m_d))
        factors.append(jnp.asarray(A @ A.T / m_d + np.eye(m_d), dtype=dtype))
    factors = tuple(factors)
    y = jnp.asarray(rng.standard_normal(m), dtype=dtype)
    # Group once up front (grouping happens at trace time either way; this
    # just keeps the matvec closure's input canonical).
    gf = group_factors(factors)

    def mv(v):
        return kron_matvec_fast(gf, v) + sigma2 * v

    # Batched CG and SLQ run on a smaller lattice (16^5 = 1.05M): CG holds
    # ~6 state blocks plus matvec temporaries per rhs — (33.5M, 8) f32 states
    # exceed one chip's HBM.
    m_s = 16**d
    factors_s = tuple(
        jnp.asarray((lambda A: A @ A.T / 16 + np.eye(16))(rng.standard_normal((16, 16))), dtype=dtype)
        for _ in range(d)
    )
    gf_s = group_factors(factors_s)
    B = 32
    YB = jnp.asarray(rng.standard_normal((m_s, B)), dtype=dtype)

    def mv_s(v):
        return kron_matvec_fast(gf_s, v) + sigma2 * v

    @jax.jit
    def solve1(b):
        x, info = cg_solve(mv, b, tol=1e-6, max_iters=400, return_info=True)
        return jnp.sum(x[:8]), info.iterations, jnp.max(info.residual_norm)

    @jax.jit
    def solve32(Bm):
        x, info = cg_solve(mv_s, Bm, tol=1e-6, max_iters=400, return_info=True)
        return jnp.sum(x[:8, 0]), info.iterations, jnp.max(info.residual_norm)

    @jax.jit
    def logdet(key):
        return slq_logdet(mv_s, m_s, key=key, num_probes=16, lanczos_iters=32, dtype=dtype)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0])  # force through the tunnel
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    t1, (_, it1, res1) = timed(solve1, y)
    print(json.dumps({
        "metric": "cg_solve_time", "value": round(t1, 4), "unit": "s",
        "detail": {"m": m, "rhs": 1, "iters": int(it1), "max_resid": float(res1),
                   "device": str(jax.devices()[0])},
    }))
    tB, (_, itB, resB) = timed(solve32, YB)
    print(json.dumps({
        "metric": "cg_solve_time_batched", "value": round(tB, 4), "unit": "s",
        "detail": {"m": m_s, "rhs": B, "iters": int(itB),
                   "per_rhs_s": round(tB / B, 5), "max_resid": float(resB)},
    }))
    tld, ld = timed(logdet, jax.random.PRNGKey(0))
    print(json.dumps({
        "metric": "slq_logdet_time", "value": round(tld, 4), "unit": "s",
        "detail": {"m": m_s, "probes": 16, "lanczos_iters": 32, "logdet": float(ld)},
    }))


if __name__ == "__main__":
    main()
