"""Pallas kernel tests in interpreter mode (CPU backend; the real-TPU path is
exercised by bench.py and the verify drive)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_grief_tpu.ops import kron_expand
from gp_grief_tpu.ops.pallas.kron_pallas import kron_matmat_pallas, kron_matvec_pallas


@pytest.mark.parametrize(
    "sizes,B",
    [
        ((4, 4, 4), 1),
        ((8, 4, 2), 1),
        ((2, 2, 2, 2, 2), 1),
        ((16, 16), 1),
        ((4, 4, 4), 5),
        ((8, 8), 3),
    ],
)
def test_pallas_kron_matmat_interpret(rng, sizes, B):
    fs = tuple(
        jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.float32) for m in sizes
    )
    m = int(np.prod(sizes))
    V = jnp.asarray(rng.standard_normal((m, B)), dtype=jnp.float32)
    got = kron_matmat_pallas(fs, V, interpret=True)
    ref = np.asarray(kron_expand(fs)) @ np.asarray(V)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_pallas_kron_rectangular_interpret(rng):
    fs = (
        jnp.asarray(rng.standard_normal((6, 4)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((3, 8)), dtype=jnp.float32),
    )
    v = jnp.asarray(rng.standard_normal(32), dtype=jnp.float32)
    got = kron_matvec_pallas(fs, v, interpret=True)
    ref = np.asarray(kron_expand(fs)) @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_phi_fused_pallas_interpret(rng):
    from gp_grief_tpu.ops.pallas.phi_pallas import phi_fused_pallas

    d, n, m, p = 3, 32, 8, 16
    B = jnp.asarray(rng.standard_normal((d, n, m)), dtype=jnp.float32)
    idx = rng.integers(0, m, size=(p, d))
    scales = rng.uniform(0.5, 2.0, size=(p, d)).astype(np.float32)
    S = np.zeros((d, m, p), dtype=np.float32)
    for dd in range(d):
        S[dd, idx[:, dd], np.arange(p)] = scales[:, dd]
    got = phi_fused_pallas(B, jnp.asarray(S), block_rows=16, interpret=True)
    ref = np.ones((n, p))
    for dd in range(d):
        ref *= np.asarray(B[dd])[:, idx[:, dd]] * scales[:, dd]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)
