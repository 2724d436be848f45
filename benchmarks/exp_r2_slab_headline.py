"""Measure the 3-pass rotation-free slab schedule vs the grouped-cyclic
chain at the headline config (d=5, m_d=32, 134 MB vectors) on the real TPU.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r2_slab_headline.py
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

from bench import _timed_loop
from gp_grief_tpu.ops import kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import (
    kron_matvec_slab,
    slab_schedule_applicable,
)

d, m_d = 5, 32
m = m_d**d
rng = np.random.default_rng(0)
factors = tuple(
    jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), jnp.float32)
    for _ in range(d)
)
v = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
print("applicable:", slab_schedule_applicable(factors, 1), flush=True)

# accuracy on a small congruent shape vs f64 oracle
szs = (4, 4, 8, 8, 8)
fs_s = tuple(
    jnp.asarray(rng.standard_normal((s, s)), jnp.float32) for s in szs
)
ms = int(np.prod(szs))
vs = jnp.asarray(rng.standard_normal((ms,)), jnp.float32)
ref = np.ones(ms)
A = np.eye(1)
for K in fs_s:
    A = np.kron(A, np.asarray(K, np.float64))
ref = A @ np.asarray(vs, np.float64)
for name, prec in [("HIGHEST(x3-pair)", jax.lax.Precision.HIGHEST),
                   ("DEFAULT(bf16-pair)", jax.lax.Precision.DEFAULT)]:
    got = np.asarray(kron_matvec_slab(fs_s, vs, precision=prec))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"acc {name}: rel(scale) {rel:.2e}", flush=True)

results = {}
for name, step in [
    ("slab_HIGHEST", lambda vv: kron_matvec_slab(factors, vv, precision=jax.lax.Precision.HIGHEST)),
    ("slab_DEFAULT", lambda vv: kron_matvec_slab(factors, vv, precision=jax.lax.Precision.DEFAULT)),
    ("cyclic_DEFAULT", lambda vv: kron_matvec_fast(factors, vv, precision=jax.lax.Precision.DEFAULT)),
    ("cyclic_HIGHEST", lambda vv: kron_matvec_fast(factors, vv)),
]:
    t = _timed_loop(step, v, iters=50)
    gbs = 2 * d * m * 4 / t / 1e9
    results[name] = {"ms": round(t * 1e3, 3), "eff_GBs": round(gbs, 1)}
    print(name, results[name], flush=True)

# device-scale accuracy: slab vs cyclic-HIGHEST (the production exact path)
exact = kron_matvec_fast(factors, v)
for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST), ("DEFAULT", jax.lax.Precision.DEFAULT)]:
    got = kron_matvec_slab(factors, v, precision=prec)
    rel = float(jnp.abs(got - exact).max() / jnp.abs(exact).max())
    print(f"device acc slab {name} vs cyclic HIGHEST: {rel:.2e}", flush=True)

print(json.dumps(results))
