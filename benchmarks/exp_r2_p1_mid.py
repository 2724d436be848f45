"""P1 mid-dot precision trade: HIGHEST (x6) vs HIGH (x3) vs DEFAULT (bf16)
inside the fused mid+pair kernel, at schedule-level timing + accuracy."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _timed_loop
from gp_grief_tpu.ops.pallas.kron_pallas import _split_bf16, _pick_BL, _SLAB_VMEM

m_d, d = 32, 5
m = m_d**d
rng = np.random.default_rng(0)
Ks = [jnp.asarray(rng.standard_normal((m_d, m_d)) / (2.2 * np.sqrt(m_d)), jnp.float32) for _ in range(d)]
v = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
Wp = jnp.kron(Ks[-2], Ks[-1])


def fused(mid_prec):
    W0 = jnp.kron(Ks[0], jnp.eye(4, dtype=jnp.float32))
    Wh, Wl = _split_bf16(Wp)
    S = 1024

    def f(x):
        x3 = x.reshape(1, 128, 262144)
        BL = 8192
        n_chunks = BL // S

        def kernel(x_ref, w0_ref, ph_ref, o_ref):
            t = lax.dot_general(
                w0_ref[:], x_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=x_ref.dtype, precision=mid_prec,
            )
            for c in range(n_chunks):
                tc = t[:, S * c:S * (c + 1)]
                th = tc.astype(jnp.bfloat16)
                acc = lax.dot_general(
                    th, ph_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, :, S * c:S * (c + 1)] = acc.astype(o_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(1, 262144 // BL),
            in_specs=[
                pl.BlockSpec((1, 128, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128, BL), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
            compiler_params=_SLAB_VMEM,
            interpret=False,
        )(x3, W0, Wh).reshape(-1)

    return f


# exact ref for accuracy (on device, small probe via exact path)
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast

ref_p1 = None
for name, prec in [("HIGHEST", lax.Precision.HIGHEST), ("HIGH", lax.Precision.HIGH), ("DEFAULT", lax.Precision.DEFAULT)]:
    fn = fused(prec)
    try:
        out = fn(v)
        if ref_p1 is None:
            ref_p1 = out  # HIGHEST result as reference
        rel = float(jnp.abs(out - ref_p1).max() / jnp.abs(ref_p1).max())
        t = _timed_loop(fn, v, iters=30)
        print(f"p1_mid_{name}: {t*1e3:.3f} ms  rel_vs_HIGHESTmid {rel:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"p1_mid_{name}: FAILED {str(e).splitlines()[0][:100]}", flush=True)
