"""Round-2 experiment (b): per-pass + end-to-end slab schedule throughput.

Sweeps tail3 block sizes and precisions, measures each pass at the bench
shape, then the full kron_matvec_slab.  Run on the TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_loop
from gp_grief_tpu.ops.pallas.kron_pallas import (
    _mid_widened_pass,
    _tail3_pass,
    kron_matvec_slab,
)

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
factors = tuple(
    jnp.asarray(rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)), dtype=jnp.float32)
    for _ in range(D)
)
v = jnp.asarray(rng.standard_normal((M,)), dtype=jnp.float32)
K = factors[0]

HI = lax.Precision.HIGHEST
DEF = lax.Precision.DEFAULT


def f64_oracle(fs, vv):
    x = np.asarray(vv, dtype=np.float64)
    for Kf in fs:
        Kf = np.asarray(Kf, dtype=np.float64)
        x = (Kf @ x.reshape(MD, -1)).T.ravel()
    return x


ref = f64_oracle(factors, v)
refmax = np.abs(ref).max()


def bench_pass(name, fn, init, words_moved):
    try:
        t0 = time.time()
        _ = jax.block_until_ready(jax.jit(fn)(init))
        c = time.time() - t0
        t = _timed_loop(fn, init, iters=30)
        print(
            f"{name:28s} t={t*1e3:7.3f} ms  bw={words_moved*4/t/1e9:7.1f} GB/s"
            f"  (compile {c:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


# Per-pass: mid-widened at factor positions 1 and 2 (pre=1, pre=32).
x3a = v.reshape(1, 128, M // 128)
bench_pass("mid1 HIGHEST", lambda x: _mid_widened_pass(x, K, 4, HI, False), x3a, 2 * M)
bench_pass("mid1 DEFAULT", lambda x: _mid_widened_pass(x, K, 4, DEF, False), x3a, 2 * M)
x3b = v.reshape(32, 128, M // 32 // 128)
bench_pass("mid2 HIGHEST", lambda x: _mid_widened_pass(x, K, 4, HI, False), x3b, 2 * M)

# tail3 at varying BB and precision.
x4 = v.reshape(M // MD**3, MD, MD, MD)
for bb in (2, 4, 8):
    bench_pass(
        f"tail3 HIGHEST BB={bb}",
        lambda x, b=bb: _tail3_pass(x, *factors[2:], HI, False, block_rows=b),
        x4,
        2 * M,
    )
for bb in (4, 8, 16):
    bench_pass(
        f"tail3 DEFAULT BB={bb}",
        lambda x, b=bb: _tail3_pass(x, *factors[2:], DEF, False, block_rows=b),
        x4,
        2 * M,
    )

# Full matvec, effective-GB/s model (2*D*M words).
for name, prec in (("HIGHEST", HI), ("DEFAULT", DEF)):
    try:
        fn = lambda vv, p=prec: kron_matvec_slab(factors, vv, precision=p)
        out = np.asarray(jax.jit(fn)(v))
        err = np.abs(out - ref).max() / refmax
        t = _timed_loop(fn, v, iters=30)
        print(
            f"slab_full {name:8s} t={t*1e3:7.3f} ms  eff={2*D*M*4/t/1e9:7.1f} GB/s"
            f"  rel_err={err:.2e}",
            flush=True,
        )
    except Exception as e:
        print(f"slab_full {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
