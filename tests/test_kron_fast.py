"""Grouped cyclic Kron matvec + trailing-slab Pallas pass vs dense oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from gp_grief_tpu.ops import kron_expand
from gp_grief_tpu.ops.kron_fast import group_factors, kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import last_slab_pass


@pytest.mark.parametrize("sizes", [(3,), (3, 4), (2, 3, 4), (4, 4, 4, 4), (5, 5, 5)])
def test_kron_matvec_fast_matches_dense(rng, sizes):
    factors = tuple(jnp.asarray(rng.standard_normal((m, m))) for m in sizes)
    K = np.asarray(kron_expand(factors))
    v = rng.standard_normal(K.shape[1])
    got = kron_matvec_fast(factors, jnp.asarray(v), target_width=8, precision=None)
    np.testing.assert_allclose(np.asarray(got), K @ v, rtol=1e-9)


def test_kron_matvec_fast_batched(rng):
    sizes = (3, 4, 2)
    factors = tuple(jnp.asarray(rng.standard_normal((m, m))) for m in sizes)
    K = np.asarray(kron_expand(factors))
    V = rng.standard_normal((K.shape[1], 5))
    got = kron_matvec_fast(factors, jnp.asarray(V), target_width=8)
    np.testing.assert_allclose(np.asarray(got), K @ V, rtol=1e-9)


def test_group_factors_widths(rng):
    fs = [jnp.asarray(rng.standard_normal((8, 8))) for _ in range(4)]
    gf = group_factors(fs, target_width=64, max_width=64)
    assert [int(g.shape[0]) for g in gf] == [64, 64]
    # Grouped product equals the full product.
    np.testing.assert_allclose(
        np.asarray(kron_expand(gf)), np.asarray(kron_expand(fs)), rtol=1e-12
    )
    # Rectangular factors break groups.
    fs2 = [fs[0], jnp.asarray(rng.standard_normal((3, 8))), fs[1]]
    gf2 = group_factors(fs2, target_width=64)
    assert [g.shape for g in gf2] == [(8, 8), (3, 8), (8, 8)]


def test_last_slab_pass_interpret(rng):
    N, S = 64, 8
    x2 = jnp.asarray(rng.standard_normal((N, S)), dtype=jnp.float32)
    W = jnp.asarray(rng.standard_normal((S, S)), dtype=jnp.float32)
    got = last_slab_pass(x2, W, BP=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x2) @ np.asarray(W).T, rtol=2e-4, atol=2e-4
    )


def test_kron_matvec_fast_dispatch_gate(rng):
    """On the CPU backend the auto dispatch must stay on the XLA chain (Pallas
    slab requires TPU); impl='slab' must raise; impl='xla' must equal auto."""
    import jax
    from jax import lax

    sizes = (4, 4, 8, 8, 8)  # slab-applicable shape class
    factors = tuple(jnp.asarray(rng.standard_normal((m, m))) for m in sizes)
    v = jnp.asarray(rng.standard_normal(int(np.prod(sizes))))
    auto = kron_matvec_fast(factors, v, precision=lax.Precision.DEFAULT)
    forced = kron_matvec_fast(factors, v, precision=lax.Precision.DEFAULT, impl="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(forced), rtol=1e-12)
    assert jax.default_backend() == "cpu"
    with pytest.raises(ValueError, match="slab"):
        kron_matvec_fast(factors, v, impl="slab")
    # The r14 general fused schedule is TPU-only too: forcing must raise.
    f2 = tuple(jnp.asarray(rng.standard_normal((m, m))) for m in (128, 128))
    v2 = jnp.asarray(rng.standard_normal(128 * 128))
    with pytest.raises(ValueError, match="fused"):
        kron_matvec_fast(f2, v2, impl="fused")


def test_kron_matvec_fast_rectangular(rng):
    factors = (
        jnp.asarray(rng.standard_normal((4, 3))),
        jnp.asarray(rng.standard_normal((5, 5))),
        jnp.asarray(rng.standard_normal((2, 6))),
    )
    K = np.asarray(kron_expand(factors))
    v = rng.standard_normal(K.shape[1])
    got = kron_matvec_fast(factors, jnp.asarray(v), target_width=8)
    np.testing.assert_allclose(np.asarray(got), K @ v, rtol=1e-9)

def test_kron_matvec_fast_highest_dispatches_fused_win_classes(rng, monkeypatch):
    """Round-5 dispatch flip (VERDICT r4 missing #4): plain Precision.HIGHEST
    — the solver default — must route exact-grade WIN-CLASS shapes onto the
    general fused schedule at Mosaic HIGHEST (same ~1e-7 grade, measured
    3.6-10x the cyclic chain), while non-win-class shapes stay on the chain
    and impl='xla' remains the escape hatch."""
    import jax
    from jax import lax

    import gp_grief_tpu.ops.kron_fast as kf
    from gp_grief_tpu.ops.pallas import kron_pallas as kp

    monkeypatch.setattr(kf, "_is_tpu", lambda: True)
    real_fused = kp.kron_matvec_fused
    calls = []

    def recording_fused(factors, v, precision=None, **kw):
        calls.append(tuple(int(K.shape[1]) for K in factors))
        return real_fused(factors, v, precision=precision, interpret=True, **kw)

    monkeypatch.setattr(kp, "kron_matvec_fused", recording_fused)

    # Exact-grade win class (measured round-5: >=512-wide factor AND >=2^21
    # total elements — the batched solver forms, e.g. (I_8, 512^2) 3.51x).
    sizes = (8, 512, 512)
    factors = (jnp.eye(8, dtype=jnp.float32),) + tuple(
        jnp.asarray(rng.standard_normal((m, m)) / np.sqrt(m), jnp.float32)
        for m in sizes[1:]
    )
    v = jnp.asarray(rng.standard_normal(int(np.prod(sizes))), jnp.float32)
    got = kron_matvec_fast(factors, v)  # default precision=HIGHEST
    assert calls == [sizes], "HIGHEST auto dispatch must take the fused path"
    ref = np.asarray(
        kron_matvec_fast(factors, v, impl="xla"), np.float64
    )
    assert not calls[1:], "impl='xla' must NOT take the fused path"
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel

    # Measured LOSS classes at exact grade ((256, 96) 0.45x, ragged B=1
    # 0.75x, small wide pairs ~1.0x): must stay on the chain at HIGHEST.
    calls.clear()
    for sizes2 in ((256, 96), (24, 48, 96), (512, 512)):
        factors2 = tuple(
            jnp.asarray(rng.standard_normal((m, m)) / np.sqrt(m), jnp.float32)
            for m in sizes2
        )
        v2 = jnp.asarray(rng.standard_normal(int(np.prod(sizes2))), jnp.float32)
        _ = kron_matvec_fast(factors2, v2, precision=lax.Precision.HIGHEST)
    assert calls == [], "non-win-class shapes must stay on the XLA chain"
