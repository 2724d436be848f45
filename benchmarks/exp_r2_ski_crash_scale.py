"""Scale the SKI combined-NLML budget to find the crash threshold
(memory fault would crash at any size; a runtime/watchdog limit crashes
beyond a duration threshold)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import gp_grief_tpu as gpx

rng = np.random.default_rng(11)
n, d = 100_000, 4
x = rng.uniform(0, 4, size=(n, d)).astype("float32")
f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1]) + 0.5 * x[:, 2] - 0.3 * x[:, 3]
y = (f + 0.1 * rng.standard_normal(n)).astype("float32")

import time

for cg_iters, k in [(50, 10), (150, 20), (300, 40), (400, 40)]:
    m = gpx.GPSKIRegression(
        x, y, [gpx.make_kernel("rbf", lengthscale=0.7) for _ in range(d)],
        mbar=32, noise_var=0.1, cg_precision="exact",
        num_probes=8, cg_iters=cg_iters, lanczos_iters=k, cg_tol=1e-6,
    )
    t0 = time.perf_counter()
    try:
        ll = m.log_likelihood()
        print(f"cg={cg_iters} k={k}: OK ll={ll:.1f} ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"cg={cg_iters} k={k}: CRASH {str(e).splitlines()[0][:90]} ({time.perf_counter()-t0:.1f}s)", flush=True)
        break
