"""Round-2 experiment: rotation-free slab schedule vs shipped grouped-cyclic.

Measures, at the bench shape (d=5, m_d=32, m=33.5M, f32, single vector):
  - kron_matvec_slab at HIGHEST / X3 / DEFAULT (in-kernel dot precision)
  - kron_matvec_fast  at HIGHEST / X3 / DEFAULT (shipped reference points)
  - accuracy of each vs a NumPy float64 oracle
Run ON THE TPU: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_slab_r2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_loop
from gp_grief_tpu.ops import kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import kron_matvec_slab

D, MD = 5, 32
M = MD**D


def f64_oracle(fs, v):
    x = np.asarray(v, dtype=np.float64)
    for K in fs:
        K = np.asarray(K, dtype=np.float64)
        X = x.reshape(MD, -1)
        x = (K @ X).T.ravel()  # cyclic rotation chain, f64 exact enough
    # after D rotating passes order is restored
    return x


def main():
    print("device:", jax.devices())
    rng = np.random.default_rng(0)
    factors = tuple(
        jnp.asarray(rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)), dtype=jnp.float32)
        for _ in range(D)
    )
    v = jnp.asarray(rng.standard_normal((M,)), dtype=jnp.float32)
    ref = f64_oracle(factors, v)
    refmax = np.abs(ref).max()

    X3 = lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    variants = []
    for name, prec in [
        ("HIGHEST", lax.Precision.HIGHEST),
        ("X3", X3),
        ("DEFAULT", lax.Precision.DEFAULT),
    ]:
        variants.append((f"slab_{name}", lambda vv, p=prec: kron_matvec_slab(factors, vv, precision=p)))
        variants.append((f"fast_{name}", lambda vv, p=prec: kron_matvec_fast(factors, vv, precision=p)))

    for name, fn in variants:
        try:
            t0 = time.time()
            out = np.asarray(jax.jit(fn)(v))
            compile_s = time.time() - t0
            err = np.abs(out - ref).max() / refmax
            t = _timed_loop(fn, v, iters=30)
            eff = 2 * D * M * 4 / t / 1e9
            print(
                f"{name:16s} t={t*1e3:8.3f} ms  eff={eff:7.1f} GB/s  "
                f"rel_err={err:.2e}  (compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
