"""Decompose the uci2m iterative-NLML gap into its CG-quad and SLQ-logdet
pieces (vs the closed-form O(p³) values), and extend the depth sweep."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    import gp_grief_tpu as gpx
    from gp_grief_tpu.kernels.grief import phi as _phi
    from gp_grief_tpu.models.base import basis_nlml  # noqa: F401
    from gp_grief_tpu.ops.cg import cg_solve, CGInfo  # noqa: F401
    from gp_grief_tpu.ops.lanczos import slq_logdet
    from gp_grief_tpu.ops.solve import logdet_from_chol

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

    # closed-form pieces
    stats = model._stats
    lw, ln = model.params["log_w"], model.params["log_noise"]
    sigma2 = float(jnp.exp(ln))
    p = stats.C.shape[0]
    P = stats.C + jnp.diag(jnp.exp(ln) * jnp.exp(-lw))
    L = jnp.linalg.cholesky(P)
    Linv_v = jax.scipy.linalg.solve_triangular(L, stats.v, lower=True)
    quad_closed = float((stats.yy - jnp.sum(Linv_v**2)) / jnp.exp(ln))
    ld_closed = float(logdet_from_chol(L) + jnp.sum(lw) + (stats.n - p) * ln)
    print(json.dumps({"quad_closed": quad_closed, "ld_closed": ld_closed,
                      "sigma2": sigma2, "n": int(stats.n)}), flush=True)

    # iterative pieces — Phi built INSIDE the jitted programs (a host-side
    # Phi + in-program copy doubles HBM and OOMs at 3 GB each).
    model._ensure_cache()
    nn = model.x.shape[0]

    def make_mv(params):
        Phi = _phi(model._basis, params["kernels"], model.xg, model.x, dims=model.dims)
        w = jnp.exp(params["log_w"])
        s2 = jnp.exp(params["log_noise"])

        def mv(vv):
            return Phi @ (w[:, None] * (Phi.T @ vv)) + s2 * vv

        return mv

    @jax.jit
    def quad_prog(params, yy):
        mv = make_mv(params)
        alpha, info = cg_solve(mv, yy, tol=1e-5, max_iters=300, return_info=True)
        return jnp.dot(yy, alpha), info.iterations, jnp.max(info.residual_norm)

    t0 = time.perf_counter()
    quad_iter, iters, res = quad_prog(model.params, model.y)
    quad_iter = float(quad_iter)
    print(json.dumps({"quad_iter": quad_iter,
                      "quad_gap": abs(quad_iter - quad_closed) / abs(quad_closed),
                      "cg_iters": int(iters), "cg_res": float(res),
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)

    for probes, k in [(8, 192), (16, 256)]:
        @jax.jit
        def ld_prog(params, key, probes=probes, k=k):
            return slq_logdet(make_mv(params), nn, key=key, num_probes=probes,
                              lanczos_iters=k, dtype=model.y.dtype)

        t0 = time.perf_counter()
        ld = float(ld_prog(model.params, jax.random.PRNGKey(0)))
        print(json.dumps({
            "probes": probes, "k": k, "ld_slq": ld,
            "ld_gap_rel": float(abs(ld - ld_closed) / abs(ld_closed)),
            "nlml_gap_rel": abs(ld - ld_closed) / (2 * abs(
                0.5 * (quad_closed + ld_closed + float(stats.n) * np.log(2 * np.pi)))),
            "s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
