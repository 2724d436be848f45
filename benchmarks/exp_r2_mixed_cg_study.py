"""NLML-level accuracy + speed study: cg_precision='mixed' (refined CG,
bf16 slab-matvec hot loop) vs 'exact' (HIGHEST cyclic matvec) on the real
TPU — the study that justifies the bench.py DEFAULT operating point
(round-1 VERDICT weak #2).

Outputs JSON lines per model/config with nlml gap, predict gap, wall times.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def timed(f, reps=3):
    out = f()  # compile+warm; axon relay: fetch forces execution
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
    return out, (time.perf_counter() - t0) / reps


def ski_study():
    import gp_grief_tpu as gpx

    rng = np.random.default_rng(11)
    # 4-D, mbar=32 -> m = 32^4 = 1.05M lattice: slab-applicable, so the
    # mixed hot loop runs the 2-pass Pallas schedule.
    n, d = 100_000, 4
    x = rng.uniform(0, 4, size=(n, d)).astype("float32")
    f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1]) + 0.5 * x[:, 2] - 0.3 * x[:, 3]
    y = (f + 0.1 * rng.standard_normal(n)).astype("float32")

    res = {}
    models = {}
    for prec in ("exact", "mixed"):
        m = gpx.GPSKIRegression(
            x, y, [gpx.make_kernel("rbf", lengthscale=0.7) for _ in range(d)],
            mbar=32, noise_var=0.1, cg_precision=prec,
            num_probes=8, cg_iters=300, lanczos_iters=40, cg_tol=1e-6,
        )
        models[prec] = m
        ll, t = timed(lambda m=m: float(m.log_likelihood()))
        res[prec] = {"nlml": ll, "t_nlml_s": round(t, 3)}
    gap = abs(res["mixed"]["nlml"] - res["exact"]["nlml"]) / abs(res["exact"]["nlml"])
    me, _ = timed(lambda: np.asarray(models["exact"].predict(x[:2000])[0]))
    mm, _ = timed(lambda: np.asarray(models["mixed"].predict(x[:2000])[0]))
    pred_gap = float(np.abs(me - mm).max() / (np.abs(me).max() + 1e-30))
    print(json.dumps({
        "study": "ski_n100k_d4_m1.05M", **res,
        "nlml_rel_gap": gap, "predict_mean_rel_gap": pred_gap,
        "speedup_nlml": round(res["exact"]["t_nlml_s"] / max(res["mixed"]["t_nlml_s"], 1e-9), 3),
    }), flush=True)


def kron_study():
    import gp_grief_tpu as gpx

    rng = np.random.default_rng(12)
    # on-grid exact GP over a 32^4 lattice (m = 1.05M): slab-applicable
    gs = [np.linspace(0, 4, 32)[:, None].astype("float32") for _ in range(4)]
    mesh = np.stack(np.meshgrid(*[g[:, 0] for g in gs], indexing="ij"), -1).reshape(-1, 4)
    f = np.sin(2 * mesh[:, 0]) * np.cos(mesh[:, 1]) + 0.5 * mesh[:, 2] - 0.3 * mesh[:, 3]
    y = (f + 0.1 * rng.standard_normal(mesh.shape[0])).astype("float32")

    res = {}
    for prec in ("exact", "mixed"):
        m = gpx.GPKroneckerRegression(
            gs, y, [gpx.make_kernel("rbf", lengthscale=0.7) for _ in range(4)],
            noise_var=0.1, solver="cg", cg_precision=prec,
            cg_iters=300, cg_tol=1e-6,
        )
        ll, t = timed(lambda m=m: float(m.log_likelihood()))
        res[prec] = {"nlml": ll, "t_nlml_s": round(t, 3)}
    gap = abs(res["mixed"]["nlml"] - res["exact"]["nlml"]) / abs(res["exact"]["nlml"])
    print(json.dumps({
        "study": "kron_grid32p4_cg", **res,
        "nlml_rel_gap": gap,
        "speedup_nlml": round(res["exact"]["t_nlml_s"] / max(res["mixed"]["t_nlml_s"], 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    ski_study()
    kron_study()
