"""SLQ logdet convergence vs Lanczos depth on the uci2m GRIEF operator.

The round-2 config run measured slq_cg_nlml_gap = 5.3% at (probes=8, k=32).
The gap is quadrature under-convergence (Gauss quadrature of log underestimates
with few nodes on the wide GRIEF spectrum), not probe variance — verified by
the k-sweep this script produces.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax


def main():
    import gp_grief_tpu as gpx

    rng = np.random.default_rng(0)
    n, d = 2_000_000, 10
    dtype = np.float32
    x = rng.uniform(-1, 1, size=(n, d)).astype(dtype)
    f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1]) + 0.4 * x[:, 2] * x[:, 3] + np.tanh(x[:, 4] + x[:, 5])
    y = (f + 0.1 * rng.standard_normal(n)).astype(dtype)
    xtr, ytr = x[:-100000], y[:-100000]

    grid = gpx.InducingGrid.build(xtr[:200000], mbar=10)
    model = gpx.GPGriefModel(
        xtr, ytr, gpx.make_kernel("rbf", lengthscale=1.0, input_dim=1), grid,
        n_eigs=400, noise_var=0.2, dtype=dtype,
    )
    model.optimize(optimizer="adam", max_iters=150, learning_rate=0.05)
    ll_closed = model.log_likelihood()
    print(json.dumps({"nlml_closed": ll_closed}), flush=True)
    for probes, k in [(8, 32), (8, 64), (8, 128), (4, 192)]:
        t0 = time.perf_counter()
        ll_iter = model.log_likelihood_iterative(
            num_probes=probes, lanczos_iters=k, cg_tol=1e-5, cg_iters=300
        )
        dt = time.perf_counter() - t0
        print(json.dumps({
            "probes": probes, "k": k, "nlml_slq_cg": ll_iter,
            "gap": abs(ll_iter - ll_closed) / abs(ll_closed), "s": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
