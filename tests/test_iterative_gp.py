"""Iterative (CG + SLQ) exact-GP NLML path vs the Cholesky path."""

import jax
import jax.numpy as jnp
import numpy as np

from gp_grief_tpu import make_kernel
from gp_grief_tpu.models.gp_regression import gp_nlml, gp_nlml_iterative


def test_iterative_nlml_close_to_exact(rng):
    n = 300
    x = jnp.asarray(rng.uniform(0, 3, size=(n, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n))
    kern = make_kernel("rbf", lengthscale=0.7, variance=1.2)
    log_noise = jnp.log(0.05)

    exact = float(gp_nlml(kern, log_noise, x, y))
    approx = float(
        gp_nlml_iterative(
            kern, log_noise, x, y,
            key=jax.random.PRNGKey(1), num_probes=64, lanczos_iters=60,
        )
    )
    # The quadratic term is CG-exact; only the SLQ log-det is stochastic.
    assert abs(approx - exact) / abs(exact) < 0.03
