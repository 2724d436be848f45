"""Round-3: where does the SKI matvec's time go?

The SKI NLML at n=100k / m=1.05M hit the ~60 s watchdog at cg_iters=400
(RESULTS_r2.md §7) — far slower than the raw Kron matvec cost predicts.
Suspect: the 2^d scatter-adds of `interp_rmatvec_bm` (`out.at[:, flat].add`)
— XLA scatter on TPU serializes colliding updates.  This script times the
three stages of `(W K Wᵀ + σ²I) v` separately on the real chip, batch-major
at B=9 (1 rhs + 8 probes).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_ski_matvec_breakdown.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_loop
from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.ops.interp import interp_matvec_bm, interp_rmatvec_bm, interp_weights
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast


def main():
    rng = np.random.default_rng(0)
    n, d, md = 100_000, 4, 32
    M = md**d
    B = 9
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    xg = tuple(jnp.asarray(np.linspace(0, 4, md, dtype="float32"))[:, None] for _ in range(d))
    iw = interp_weights(jnp.asarray(x), xg)
    factors = cov_grid([make_kernel("rbf", lengthscale=0.7)] * d, xg)
    eyeB = jnp.eye(B, dtype=jnp.float32)

    v = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
    u = jnp.asarray(rng.standard_normal((B, M)).astype("float32"))

    t_scatter = _timed_loop(
        lambda vv: interp_rmatvec_bm(iw, vv) [:, :n],  # (B, n) -> (B, M) -> slice keeps shape-stable chain
        v, iters=20,
    )
    t_kron = _timed_loop(
        lambda uu: kron_matvec_fast((eyeB, *factors), uu.reshape(-1),
                                    precision=jax.lax.Precision.DEFAULT).reshape(B, M),
        u, iters=20,
    )
    t_gather = _timed_loop(
        lambda uu: jnp.pad(interp_matvec_bm(iw, uu), ((0, 0), (0, M - n))),
        u, iters=20,
    )
    print(f"scatter  Wt v   (B,n)->(B,M): {t_scatter*1e3:8.2f} ms")
    print(f"kron     K u    (B,M)->(B,M): {t_kron*1e3:8.2f} ms")
    print(f"gather   W u    (B,M)->(B,n): {t_gather*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
