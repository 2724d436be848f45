"""r14: general-shape fused Kron matvec vs the cyclic XLA chain (VERDICT #1).

Shapes the slab schedule REJECTS — ragged m_d, d=2, wide trailing pairs —
previously ran exact-grade solves on the cyclic chain (161 GB/s at the
headline geometry).  Measures kron_matvec_fused (HIGHEST + DEFAULT) against
kron_matvec_fast(impl='xla') at both precisions, slope-timed (bench.py
methodology), plus on-chip correctness vs the f64 expand oracle.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import (
    fused_schedule_applicable,
    kron_matvec_fused,
    slab_schedule_applicable,
)


def timed(step, init, iters=30, reps=5):
    @jax.jit
    def run(v, n):
        def body(i, vv):
            return lax.optimization_barrier(step(vv))

        v = lax.fori_loop(0, n, body, v, unroll=False)
        return jnp.sum(v.reshape(-1)[:8])

    short_n, long_n = 5, 5 + iters
    _ = float(run(init, long_n))

    def best_of(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(init, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((best_of(long_n) - best_of(short_n)) / iters, 1e-9)


def norm(K, m):
    return K / (1.05 * np.linalg.norm(K, 2))


def main():
    rng = np.random.default_rng(0)
    # eye=k prepends I_k — the solvers' B-major batching convention
    # ((eyeB, *factors) with a flat vector), which is how every hot path
    # actually calls the op.
    shapes = [
        ("d3 ragged 24x48x96", [24, 48, 96], 0, 300),
        ("d3 ragged 24x48x96 eyeB8", [24, 48, 96], 8, 100),
        ("d2 1024x1024", [1024, 1024], 0, 100),
        ("d2 1024x1024 eyeB4", [1024, 1024], 4, 60),
        ("d3 ragged 40x56x72", [40, 56, 72], 0, 300),
        ("d4 ragged 24x48x96x24 (gated: tail 24)", [24, 48, 96, 24], 0, 100),
        ("d2 512x512 eyeB8", [512, 512], 8, 100),
        ("d4 wide pair 8x8x64x64 (gated: tail 64)", [8, 8, 64, 64], 0, 100),
        ("d3 ragged 40x56x72 eyeB8", [40, 56, 72], 8, 60),
        ("d3 ragged 100x100x100", [100, 100, 100], 0, 100),
        ("d3 ragged 100x100x100 eyeB8", [100, 100, 100], 8, 40),
        ("d3 ragged 200x100x50 (tail 50: gated)", [200, 100, 50], 0, 100),
        ("d3 ragged 50x100x200", [50, 100, 200], 0, 100),
        ("d2 2048x2048", [2048, 2048], 0, 60),
    ]
    for name, ms, eye, iters in shapes:
        B = 1
        fs = tuple(
            jnp.asarray(norm(rng.standard_normal((mm, mm)), mm), dtype=jnp.float32)
            for mm in ms
        )
        if eye:
            fs = (jnp.eye(eye, dtype=jnp.float32),) + fs
            ms = [eye] + list(ms)
        m = int(np.prod(ms))
        v = jnp.asarray(rng.standard_normal((m, B)), dtype=jnp.float32)
        app = fused_schedule_applicable(fs, B)
        slab = slab_schedule_applicable(fs, B)
        print(f"== {name}: m={m} B={B} fused_app={app} slab_app={slab}", flush=True)
        if not app:
            continue
        # correctness vs f64 per-factor chain
        x64 = np.asarray(v, dtype=np.float64)
        cur = x64
        pre = 1
        rest = m
        for i, mm in enumerate(ms):
            rest //= mm
            cur = cur.reshape(pre, mm, rest * B)
            cur = np.einsum("ok,pkq->poq", np.asarray(fs[i], np.float64), cur)
            pre *= mm
        ref = cur.reshape(m, B)
        out_hi = np.asarray(jax.jit(lambda vv: kron_matvec_fused(fs, vv))(v))
        out_df = np.asarray(
            jax.jit(
                lambda vv: kron_matvec_fused(fs, vv, precision=lax.Precision.DEFAULT)
            )(v)
        )
        rel_hi = np.linalg.norm(out_hi - ref) / np.linalg.norm(ref)
        rel_df = np.linalg.norm(out_df - ref) / np.linalg.norm(ref)
        print(f"   rel: fused-HI {rel_hi:.2e}  fused-DEF {rel_df:.2e}", flush=True)
        bytes_alg = 2 * m * B * 4

        rows = []
        for tag, step in [
            ("xla HIGHEST", lambda vv: kron_matvec_fast(
                fs, vv, impl="xla", precision=lax.Precision.HIGHEST)),
            ("xla DEFAULT", lambda vv: kron_matvec_fast(
                fs, vv, impl="xla", precision=lax.Precision.DEFAULT)),
            ("fused HIGHEST", lambda vv: kron_matvec_fused(fs, vv)),
            ("fused DEFAULT", lambda vv: kron_matvec_fused(
                fs, vv, precision=lax.Precision.DEFAULT)),
        ]:
            t = timed(step, v, iters=iters)
            rows.append((tag, t))
            print(
                f"   {tag:14s} {t * 1e6:9.1f} us  "
                f"({bytes_alg / t / 1e9:7.1f} GB/s alg-eff)",
                flush=True,
            )
        t_xla = rows[0][1]
        t_f = rows[2][1]
        print(f"   speedup exact-grade: {t_xla / t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
