"""Round-4: end-to-end GPKroneckerRegression NLML wall time, exact vs mixed
vs mixed16 (bf16 inner-CG state), on a d=5x32 lattice (m=33.5M) — the scale
where the solver state traffic is the cost.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python -u benchmarks/exp_r4_mixed16_e2e.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from gp_grief_tpu import GPKroneckerRegression, make_kernel
from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    d, md = 5, 32
    m = md**d
    rng = np.random.default_rng(0)
    xg = [np.sort(rng.uniform(0, 3, md))[:, None].astype(np.float32) for _ in range(d)]
    y = rng.standard_normal(m).astype(np.float32)

    vals = {}
    for prec in ("exact", "mixed", "mixed16"):
        model = GPKroneckerRegression(
            xg, y, [make_kernel("rbf", lengthscale=1.2) for _ in range(d)],
            noise_var=0.5, solver="cg", cg_tol=1e-6, cg_iters=250,
            cg_precision=prec, precond_rank=64,
        )
        nl = float(model.log_likelihood())  # compile + first run
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            nl = float(model.log_likelihood())
            best = min(best, time.perf_counter() - t0)
        vals[prec] = nl
        print(f"{prec:8s} nlml={nl:.4f}  warm wall {best:6.2f} s", flush=True)
    ref = vals["exact"]
    for prec in ("mixed", "mixed16"):
        print(f"{prec}: rel nlml gap {abs(vals[prec]-ref)/abs(ref):.2e}")


if __name__ == "__main__":
    main()
