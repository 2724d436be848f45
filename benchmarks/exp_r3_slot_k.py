"""Round-3: ELL width (max_slots=K) sweep for the exact slot-gather Wᵀ.

Gather cost is B·M·K elements; mean node fill is only 2^d·n/M ≈ 1.52, so
K=8 gathers ~5× padding zeros.  Smaller K moves tail entries to the
residual scatter-add (measured ~143M elem/s — slow, so the tail must stay
tiny).  Sweep K, report time + overflow size.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_slot_k.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from bench import _timed_loop
from gp_grief_tpu.ops.interp import (
    build_interp_plan,
    interp_rmatvec_bm,
    interp_rmatvec_bm_exact,
    interp_weights,
)


def main():
    rng = np.random.default_rng(0)
    n, d, md = 100_000, 4, 32
    B = 9
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    xg = tuple(jnp.asarray(np.linspace(0, 4, md, dtype="float32"))[:, None] for _ in range(d))
    iw = interp_weights(jnp.asarray(x), xg)
    v = jnp.asarray(rng.standard_normal((B, n)).astype("float32"))
    ref = interp_rmatvec_bm(iw, v)

    for K in (2, 3, 4, 6, 8):
        plan = build_interp_plan(iw, max_slots=K)
        fn = lambda vv: interp_rmatvec_bm_exact(plan, vv)[:, :n]
        out = interp_rmatvec_bm_exact(plan, v)
        rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-30))
        t = _timed_loop(fn, v, iters=10)
        print(
            f"K={K}: {t*1e3:8.2f} ms  overflow={int(plan.ov_ids.shape[0]):7d}"
            f"  rel {rel:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
