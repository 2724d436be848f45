"""Isolate which slab-schedule kernel fails Mosaic compile on the TPU."""

import sys
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from gp_grief_tpu.ops.pallas.kron_pallas import (
    _mid_widened_pass,
    _tail3_pass,
    last_slab_pass,
)

MD = 32
rng = np.random.default_rng(0)
K = jnp.asarray(rng.standard_normal((MD, MD)) / 8, dtype=jnp.float32)


def attempt(name, fn):
    try:
        out = np.asarray(jax.jit(fn)())
        print(f"{name}: OK out_norm={np.linalg.norm(out):.4g}", flush=True)
    except Exception:
        tb = traceback.format_exc()
        print(f"{name}: FAIL\n{tb[-2500:]}", flush=True)


# mid-widened: (pre, 128, L)
x3 = jnp.asarray(rng.standard_normal((32, 128, 1024)), dtype=jnp.float32)
attempt(
    "mid_widened HIGHEST",
    lambda: _mid_widened_pass(x3, K, 4, lax.Precision.HIGHEST, False),
)
attempt(
    "mid_widened X3",
    lambda: _mid_widened_pass(
        x3, K, 4, lax.DotAlgorithmPreset.BF16_BF16_F32_X3, False
    ),
)

# tail3: (N, 32, 32, 32)
x4 = jnp.asarray(rng.standard_normal((64, MD, MD, MD)), dtype=jnp.float32)
attempt(
    "tail3 HIGHEST",
    lambda: _tail3_pass(x4, K, K, K, lax.Precision.HIGHEST, False),
)
attempt(
    "tail3 DEFAULT",
    lambda: _tail3_pass(x4, K, K, K, lax.Precision.DEFAULT, False),
)

# last_slab control (known-good from r1)
x2 = jnp.asarray(rng.standard_normal((8192, 128)), dtype=jnp.float32)
W = jnp.kron(jnp.eye(4, dtype=jnp.float32), K)
attempt("last_slab", lambda: last_slab_pass(x2, W))
