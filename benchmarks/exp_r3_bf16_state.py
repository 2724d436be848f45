"""Round-3 experiment: bf16 inner-CG state for the refined-CG hot loop.

At lattice scale (m=33.5M) one refined-CG inner iteration costs the matvec
(~2.25 ms, bf16-mid slab) PLUS the CG state updates: 4-5 elementwise passes
over (m,)-f32 arrays ≈ 0.8-1.3 ms of pure HBM traffic.  Storing the inner
state (r, z, p, Ap) in bf16 halves that and lets the slab read a bf16 input
(P1's read drops 134 → 67 MB).  The x accumulator and all scalar reductions
stay f32.  The inner solve's stagnation floor rises to ~bf16 epsilon; the
refined outer loop (exact residual refreshes) restores final accuracy, at
the cost of more restarts when κ is large.

Measures on the real chip: per-iteration time and end-solve accuracy of
  (a) f32 inner state (today's cg_solve_refined inner loop)
  (b) bf16 inner state (hand-rolled variant below)
on the d=5×32 Kron + σ²I operator at a benign κ.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_bf16_state.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import kron_matvec_slab


def cg_fixed_f32(matvec, b, num_iters):
    r0 = b - 0.0
    rz0 = jnp.sum(r0 * r0)

    def body(state, _):
        x, r, p, rz = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = jnp.sum(r * r)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = r + beta * p
        return (x, r, p, rz_new), None

    (x, r, _, _), _ = lax.scan(body, (jnp.zeros_like(b), r0, r0, rz0), None, length=num_iters)
    return x


def cg_fixed_bf16(matvec_bf16_in, b, num_iters):
    """Inner state r/p/Ap in bf16; x accumulator f32; reductions f32."""
    r0 = b.astype(jnp.bfloat16)
    rz0 = jnp.sum(r0.astype(jnp.float32) * r0.astype(jnp.float32))

    def body(state, _):
        x, r, p, rz = state
        Ap = matvec_bf16_in(p)  # bf16 in, bf16 out
        pAp = jnp.sum(p.astype(jnp.float32) * Ap.astype(jnp.float32))
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p.astype(jnp.float32)
        r = (r.astype(jnp.float32) - alpha * Ap.astype(jnp.float32)).astype(jnp.bfloat16)
        rz_new = jnp.sum(r.astype(jnp.float32) ** 2)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = (r.astype(jnp.float32) + beta * p.astype(jnp.float32)).astype(jnp.bfloat16)
        return (x, r, p, rz_new), None

    (x, r, _, _), _ = lax.scan(
        body, (jnp.zeros(b.shape, jnp.float32), r0, r0, rz0), None, length=num_iters
    )
    return x


def timed(fn, v, reps=2):
    out = fn(v)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(v)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    d, md = 5, 32
    m = md**d
    rng = np.random.default_rng(0)
    factors = tuple(
        jnp.asarray(rng.standard_normal((md, md)) / np.sqrt(md), jnp.float32)
        for _ in range(d)
    )
    # SPD operator: K Kᵀ-free — use (⊗A)(⊗A)ᵀ = ⊗(A Aᵀ) + σ² I with benign σ².
    spd = tuple(A @ A.T + 0.1 * jnp.eye(md) for A in factors)
    sigma2 = 1.0
    y = jnp.asarray(rng.standard_normal(m), jnp.float32)

    def mv_f32(v):
        return kron_matvec_slab(spd, v, precision=lax.Precision.DEFAULT,
                                mid_dtype=jnp.bfloat16) + sigma2 * v

    def mv_bf16(v):  # bf16 in → bf16 out: the slab reads the bf16 vector natively
        out = kron_matvec_slab(spd, v, precision=lax.Precision.DEFAULT,
                               mid_dtype=jnp.bfloat16)
        return (out.astype(jnp.float32) + sigma2 * v.astype(jnp.float32)).astype(jnp.bfloat16)

    def mv_exact(v):
        return kron_matvec_fast(spd, v) + sigma2 * v

    K = 50
    f32_run = jax.jit(lambda b: cg_fixed_f32(mv_f32, b, K))
    bf16_run = jax.jit(lambda b: cg_fixed_bf16(mv_bf16, b, K))

    t_f32 = timed(f32_run, y)
    t_bf16 = timed(bf16_run, y)

    x_f32 = f32_run(y)
    x_bf16 = bf16_run(y)
    yn = float(jnp.linalg.norm(y))
    r_f32 = float(jnp.linalg.norm(y - mv_exact(x_f32))) / yn
    r_bf16 = float(jnp.linalg.norm(y - mv_exact(x_bf16))) / yn
    print(f"f32-state  inner CG x{K}: {t_f32*1e3:8.1f} ms ({t_f32/K*1e3:6.2f} ms/iter)  rel-resid {r_f32:.3e}")
    print(f"bf16-state inner CG x{K}: {t_bf16*1e3:8.1f} ms ({t_bf16/K*1e3:6.2f} ms/iter)  rel-resid {r_bf16:.3e}")


if __name__ == "__main__":
    main()
