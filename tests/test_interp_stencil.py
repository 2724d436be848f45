"""WᵀW stencil (ops/interp_stencil.py) vs dense oracles."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gp_grief_tpu.ops.interp import (
    build_corner_stream,
    interp_expand,
    interp_weights,
)
from gp_grief_tpu.ops.interp_stencil import (
    build_wtw_stencil,
    make_wtw_stencil_op,
    wtw_stencil_bm,
)


def _case(rng, shape, n, spread=1.2):
    d = len(shape)
    xg = [jnp.asarray(np.sort(rng.uniform(0, 1, (m,)))) for m in shape]
    x = jnp.asarray(rng.uniform(-0.1, spread, (n, d)))  # exercises clamping
    iw = interp_weights(x, xg)
    W = np.asarray(interp_expand(iw))
    return iw, W


@pytest.mark.parametrize(
    "shape,n",
    [((6,), 17), ((5, 4), 30), ((5, 4, 3), 50), ((4, 3, 3, 2), 64), ((3, 1, 4), 21)],
)
def test_stencil_matches_dense_wtw(rng, shape, n):
    iw, W = _case(rng, shape, n)
    st = build_wtw_stencil(iw)
    assert st is not None
    assert len(st.deltas) <= 3 ** len(shape)
    M = math.prod(shape)
    v = jnp.asarray(rng.standard_normal((3, M)))
    ref = np.asarray(v) @ (W.T @ W).T
    got = wtw_stencil_bm(st, v)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-10, atol=1e-12)


def test_stencil_shares_stream_and_is_param_free(rng):
    shape, n = (5, 4, 3), 40
    iw, W = _case(rng, shape, n)
    stream = build_corner_stream(iw)
    st = build_wtw_stencil(iw, stream=stream)
    st2 = build_wtw_stencil(iw)
    np.testing.assert_allclose(
        np.asarray(st.tables), np.asarray(st2.tables), rtol=0, atol=0
    )
    assert st.deltas == st2.deltas


def test_stencil_pallas_interpret_matches_xla(rng):
    # Forces the Pallas kernel (interpret mode) including the single-window
    # blocking path, vs the XLA shifted-add reference.
    shape, n = (8, 6, 5, 4), 300
    iw, W = _case(rng, shape, n)
    st = build_wtw_stencil(iw)
    M = math.prod(shape)
    v = jnp.asarray(rng.standard_normal((2, M)).astype(np.float32))
    stf = st._replace(tables=st.tables.astype(jnp.float32))
    ref = wtw_stencil_bm(stf, v)  # XLA path on CPU
    got = wtw_stencil_bm(stf, v, block_cells=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-6
    )


def test_stencil_pallas_split3_window_mode(rng):
    # stride0 = 256 > C + 2*S_rest with C=128 → the 3-window blocking.
    shape, n = (8, 32, 4, 2), 400
    iw, W = _case(rng, shape, n)
    st = build_wtw_stencil(iw)
    M = math.prod(shape)
    v = jnp.asarray(rng.standard_normal((5, M)).astype(np.float32))
    stf = st._replace(tables=st.tables.astype(jnp.float32))
    ref = np.asarray(v) @ (W.T @ W).T
    got = wtw_stencil_bm(stf, v, block_cells=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_stencil_vjp_is_self_adjoint(rng):
    shape, n = (5, 4, 3), 40
    iw, W = _case(rng, shape, n)
    st = build_wtw_stencil(iw)
    M = math.prod(shape)
    op = make_wtw_stencil_op(st)
    v = jnp.asarray(rng.standard_normal((2, M)))

    def f(v):
        return jnp.sum(jnp.sin(op(v)))

    g = jax.grad(f)(v)
    A = W.T @ W
    ref = np.cos(np.asarray(v) @ A.T) @ A  # Aᵀ = A
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-9, atol=1e-11)


def test_stencil_grad_through_jit_and_hoisting(rng):
    from gp_grief_tpu.utils.closure import explicit_closure

    shape, n = (4, 4), 25
    iw, W = _case(rng, shape, n)
    st = build_wtw_stencil(iw)
    M = math.prod(shape)
    op = make_wtw_stencil_op(st)

    def loss(v):
        return jnp.sum(op(v) ** 2)

    v = jnp.asarray(rng.standard_normal((1, M)))
    pure, consts = explicit_closure(loss, jax.ShapeDtypeStruct(v.shape, v.dtype))
    got = jax.jit(jax.grad(pure, argnums=1))(consts, v)
    A = W.T @ W
    ref = 2.0 * (np.asarray(v) @ A.T) @ A
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-9, atol=1e-11)
    # The tables must ride as hoisted consts, not baked literals.
    total = sum(np.asarray(c).size for c in consts)
    assert total >= st.tables.size


def test_stencil_memory_gate():
    rng = np.random.default_rng(0)
    iw, _ = _case(rng, (6, 5, 4), 30)
    assert build_wtw_stencil(iw, max_table_bytes=64) is None


def test_stencil_empty_and_single_point(rng):
    xg = [jnp.asarray(np.linspace(0, 1, 5)), jnp.asarray(np.linspace(0, 1, 4))]
    iw = interp_weights(jnp.zeros((0, 2)), xg)
    st = build_wtw_stencil(iw)
    out = wtw_stencil_bm(st, jnp.ones((2, 20)))
    np.testing.assert_allclose(np.asarray(out), 0.0)

    iw1 = interp_weights(jnp.asarray([[0.3, 0.9]]), xg)
    st1 = build_wtw_stencil(iw1)
    W = np.asarray(interp_expand(iw1))
    v = jnp.asarray(np.random.default_rng(1).standard_normal((1, 20)))
    np.testing.assert_allclose(
        np.asarray(wtw_stencil_bm(st1, v)), np.asarray(v) @ (W.T @ W).T,
        rtol=1e-12, atol=1e-14,
    )
