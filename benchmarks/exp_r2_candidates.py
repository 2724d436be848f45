"""Round-2 shipping decision: measure every shipped Kron-matvec candidate.

Headline shape d=5 x m_d=32 (m=33.5M, 134 MB f32 vectors) on the real TPU.
Candidates:
  fast_HI / fast_X3 / fast_DEF  -- ops.kron_fast.kron_matvec_fast at
                                   HIGHEST / BF16_BF16_F32_X3 / DEFAULT
  slab_HI_r<k>                  -- ops.pallas.kron_matvec_slab (rotation-free
                                   Pallas schedule) at HIGHEST, tail_block_rows=k
  pallas_chain                  -- ops.pallas.kron_matmat_pallas (per-factor)
Accuracy vs a float64 NumPy oracle.  Effective GB/s = 2*d*m*4 / t (the d-pass
algorithmic traffic model used by bench.py / BASELINE).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_loop
from gp_grief_tpu.ops import kron_matvec_fast
from gp_grief_tpu.ops.pallas import kron_matvec_slab, kron_matmat_pallas, slab_schedule_applicable

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
factors_np = [rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)) for _ in range(D)]
factors = tuple(jnp.asarray(K, dtype=jnp.float32) for K in factors_np)
v_np = rng.standard_normal((M,))
v = jnp.asarray(v_np, dtype=jnp.float32)

# f64 oracle: chain of tensordots
x = v_np.reshape([MD] * D)
for i, K in enumerate(factors_np):
    x = np.moveaxis(np.tensordot(K, x, axes=([1], [i])), 0, i)
ref = x.reshape(-1)
refmax = np.abs(ref).max()

print(f"slab applicable: {slab_schedule_applicable(factors)}", flush=True)


def bench(name, fn):
    try:
        t0 = time.time()
        out = np.asarray(jax.jit(fn)(v))
        c = time.time() - t0
        err = np.abs(out - ref).max() / refmax
        t = _timed_loop(fn, v, iters=30)
        gbs = 2 * D * M * 4 / t / 1e9
        print(f"{name:18s} t={t*1e3:7.3f} ms  bw={gbs:7.1f} GB/s  rel_err={err:.1e}  (compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


CASES = os.environ.get("CASES", "fast_HI,fast_X3,fast_DEF,slab_HI_r8,slab_HI_r16,pallas_chain").split(",")

for case in CASES:
    if case == "fast_HI":
        bench(case, lambda vv: kron_matvec_fast(factors, vv, precision=lax.Precision.HIGHEST))
    elif case == "fast_X3":
        bench(case, lambda vv: kron_matvec_fast(factors, vv, precision=lax.DotAlgorithmPreset.BF16_BF16_F32_X3))
    elif case == "fast_X6":
        bench(case, lambda vv: kron_matvec_fast(factors, vv, precision=lax.DotAlgorithmPreset.BF16_BF16_F32_X6))
    elif case == "fast_DEF":
        bench(case, lambda vv: kron_matvec_fast(factors, vv, precision=lax.Precision.DEFAULT))
    elif case.startswith("slab_HI_r"):
        k = int(case.split("r")[-1])
        bench(case, lambda vv, k=k: kron_matvec_slab(factors, vv, tail_block_rows=k))
    elif case == "pallas_chain":
        bench(case, lambda vv: kron_matmat_pallas(factors, vv))
    else:
        print(f"unknown case {case}", flush=True)
