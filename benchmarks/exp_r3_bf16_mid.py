"""Round-3 experiment: bf16-stored inter-pass intermediates in the slab matvec.

Every slab pass is DMA-bound and read+write serialize (RESULTS_r2.md §1), so
the 2-pass DEFAULT schedule moves 4·m words (read v, write mid, read mid,
write out).  Storing the intermediate bf16 cuts that to 3·m words.

Accuracy (interpret-mode, CPU): DEFAULT 2.3e-3 → 3.3e-3 with bf16 mid — the
same error class as the DEFAULT bf16 products themselves; the refined-CG
outer loop erases both.

Run on the real chip: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_bf16_mid.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bench import _timed_loop
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
from gp_grief_tpu.ops.pallas.kron_pallas import kron_matvec_slab


def main():
    d, md = 5, 32
    m = md**d
    rng = np.random.default_rng(0)
    # bench.py normalization: spectral radius < 1 so 50 chained matvecs stay
    # finite without a per-iteration normalization pass.
    factors = tuple(
        jnp.asarray(rng.standard_normal((md, md)) / (2.2 * np.sqrt(md)), jnp.float32)
        for _ in range(d)
    )
    v = jnp.asarray(rng.standard_normal(m), jnp.float32)
    bytes_eff = 2 * d * m * 4  # algorithmic-traffic model (BASELINE.json:2)

    ref = kron_matvec_fast(factors, v, precision=lax.Precision.HIGHEST)
    refn = float(jnp.linalg.norm(ref))

    configs = [
        ("slab DEFAULT f32-mid", dict(precision=lax.Precision.DEFAULT)),
        ("slab DEFAULT bf16-mid", dict(precision=lax.Precision.DEFAULT, mid_dtype=jnp.bfloat16)),
        ("slab HIGHEST", dict(precision=lax.Precision.HIGHEST)),
    ]
    for name, kw in configs:
        out = kron_matvec_slab(factors, v, **kw)
        rel = float(jnp.linalg.norm(out - ref)) / refn
        t = _timed_loop(lambda x, kw=kw: kron_matvec_slab(factors, x, **kw), v)
        print(
            f"{name:26s} {t*1e3:7.3f} ms  eff {bytes_eff/t/1e9:6.1f} GB/s  rel {rel:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
