"""r13: does running P1's widened m0 contraction as ONE bf16 dot (instead of
Mosaic HIGHEST x6) buy its serialized compute back at Precision.DEFAULT?
Accuracy question: the m0 mid is W-left, so bf16 collapses to single-bf16
error there (~2e-3) - same order as the pair's bf16 dot that already bounds
the DEFAULT point."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from gp_grief_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import gp_grief_tpu.ops.pallas.kron_pallas as kp
from bench import _timed_loop

d, m_d = 5, 32
m = m_d ** d
rng = np.random.default_rng(0)
fs = tuple(jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2*np.sqrt(m_d)), jnp.float32) for _ in range(d))
v = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast
ref = kron_matvec_fast(fs, v, impl="xla", precision=jax.lax.Precision.HIGHEST)

# Patch: variant of _fused_mid_pair_pass whose mid dot runs one bf16 MXU dot.
orig = kp._fused_mid_pair_pass

def patched(x3, K0, G, Wp, S, precision, interpret, out_dtype=None):
    pre, m0G, L = x3.shape
    m0o = int(K0.shape[0])
    out_dtype = x3.dtype if out_dtype is None else jnp.dtype(out_dtype)
    W0 = jnp.kron(K0, jnp.eye(G, dtype=K0.dtype)).astype(jnp.bfloat16)
    Wp_h, Wp_l = kp._split_bf16(Wp)
    itemsize = (x3.dtype.itemsize + jnp.dtype(out_dtype).itemsize) // 2
    BL = kp._pick_BL(L, (m0G + m0o * G) * itemsize // 2)
    if BL % S:
        BL = S * kp._largest_divisor(L // S, max(1, BL // S))
    n_chunks = BL // S

    def kernel(x_ref, w0_ref, ph_ref, pl_ref, o_ref):
        t = lax.dot_general(
            w0_ref[:], x_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for c in range(n_chunks):
            tc = t[:, S*c:S*(c+1)]
            th = tc.astype(jnp.bfloat16)
            acc = lax.dot_general(th, ph_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            o_ref[0, :, S*c:S*(c+1)] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pre, L // BL),
        in_specs=[
            pl.BlockSpec((1, m0G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m0o * G, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pre, m0o * G, L), out_dtype),
        compiler_params=kp._SLAB_VMEM,
        interpret=interpret,
    )(x3, W0, Wp_h, Wp_l)

for tag, fn in (("baseline DEFAULT+bf16mids", orig), ("P1-mid-bf16 DEFAULT+bf16mids", patched)):
    kp._fused_mid_pair_pass = fn
    out = kp.kron_matvec_slab(fs, v, precision=jax.lax.Precision.DEFAULT, mid_dtype=jnp.bfloat16)
    rel = float(jnp.linalg.norm(out.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))
    t = _timed_loop(lambda vv: kp.kron_matvec_slab(fs, vv, precision=jax.lax.Precision.DEFAULT, mid_dtype=jnp.bfloat16), v, iters=50)
    print(f"{tag}: {t*1e3:.3f} ms -> {2*d*m*4/t/1e9:.1f} GB/s eff, rel {rel:.2e}", flush=True)
kp._fused_mid_pair_pass = orig
