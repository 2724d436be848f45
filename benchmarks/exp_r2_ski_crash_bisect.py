"""Bisect the TPU worker crash in the SKI d=4/mbar=32/n=100k NLML."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import gp_grief_tpu as gpx
from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.ops.cg import cg_solve
from gp_grief_tpu.ops.lanczos import slq_logdet

rng = np.random.default_rng(11)
n, d = 100_000, 4
x = rng.uniform(0, 4, size=(n, d)).astype("float32")
f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1]) + 0.5 * x[:, 2] - 0.3 * x[:, 3]
y = (f + 0.1 * rng.standard_normal(n)).astype("float32")

m = gpx.GPSKIRegression(
    x, y, [gpx.make_kernel("rbf", lengthscale=0.7) for _ in range(d)],
    mbar=32, noise_var=0.1, cg_precision="exact",
    num_probes=8, cg_iters=400, cg_tol=1e-6,
)
print("model built; lattice", [int(g.shape[0]) for g in m.xg], flush=True)

factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=0.0)
sigma2 = jnp.exp(m.params["log_noise"])
mv = m._matvec(factors, sigma2)

# (a) single matvec
out = jax.jit(lambda v: mv(v[:, None])[:, 0])(m.y)
print("a) matvec ok", float(out[0]), flush=True)

# (b) small CG (20 iters)
sol = jax.jit(lambda v: cg_solve(mv, v, tol=1e-6, max_iters=20))(m.y)
print("b) cg20 ok", float(sol[0]), flush=True)

# (c) full CG batched rhs (y + 8 probes)
z = jax.random.rademacher(jax.random.PRNGKey(0), (n, 8), dtype=m.y.dtype)
rhs = jnp.concatenate([m.y[:, None], z], axis=1)
sol = jax.jit(lambda r: cg_solve(mv, r, tol=1e-6, max_iters=400))(rhs)
print("c) cg400 batched ok", float(sol[0, 0]), flush=True)

# (d) SLQ
ld = jax.jit(
    lambda key: slq_logdet(mv, n, key=key, num_probes=8, lanczos_iters=40,
                           dtype=m.y.dtype)
)(jax.random.PRNGKey(1))
print("d) slq ok", float(ld), flush=True)

# (e) the full loss program
ll = m.log_likelihood()
print("e) full loss ok", ll, flush=True)
