"""r13: exact-grade 2-pass slab (fused mid2 at Mosaic HIGHEST) vs the r2
3-pass X3 schedule, d=5x32 headline shape (VERDICT r2 next-step #3)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from gp_grief_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from gp_grief_tpu.ops.pallas.kron_pallas import kron_matvec_slab
from bench import _timed_loop

d, m_d = 5, 32
m = m_d ** d
rng = np.random.default_rng(0)
fs = tuple(jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), jnp.float32) for _ in range(d))
v = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()
v.block_until_ready()

# accuracy vs f64 reference on a small probe: use full-vector f32 HIGHEST cyclic as proxy
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
ref = kron_matvec_fast(fs, v, impl="xla", precision=jax.lax.Precision.HIGHEST)
for prec, tag in ((jax.lax.Precision.HIGHEST, "HIGHEST (2-pass fused mid2)"),
                  (jax.lax.Precision.DEFAULT, "DEFAULT (2-pass bf16)")):
    got = kron_matvec_slab(fs, v, precision=prec)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    t = _timed_loop(lambda vv, p=prec: kron_matvec_slab(fs, vv, precision=p), v, iters=50)
    gbs = 2 * d * m * 4 / t / 1e9
    print(f"{tag}: {t*1e3:.3f} ms -> {gbs:.1f} GB/s eff, rel {rel:.2e}", flush=True)
