"""XLA:TPU determinism bug map: iterated batched applies at unsafe sublane extents.

Symptom (found while validating the fused CG+SLQ NLML at n=1M/32^4): the
composed lattice-dual operator ``white(v) = v + msqrt(WtW u - cbar u)``,
iterated inside a ``lax.scan``, returns run-to-run DIFFERENT results (and
occasionally NaN) for batch extents B in {9, 10, 11, 12}, while B in {2..8}
and multiples of 8 (16, 24) are bitwise deterministic.  Single applications
are always deterministic; msqrt / wtw / single-diamond compositions are
deterministic at every B tested — only the full double-diamond composition
under iteration is affected.  Consistent with an XLA:TPU relayout reading
uninitialized partial-tile sublane padding whose content varies with buffer
reuse.

Workaround shipped: ops/batching.py safe_batch_op (pad to a safe extent,
slice back — exact for linear operators), wrapped around every
solver-facing batched operator in models/gp_ski.py.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r8_determinism.py
"""

import sys

sys.path.insert(0, "/root/repo")

from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gp_grief_tpu.kernels.grid import cov_grid
from gp_grief_tpu.kernels.stationary import make_kernel
from gp_grief_tpu.models.gp_ski import GPSKIRegression
from gp_grief_tpu.ops.cg import _reducers
from gp_grief_tpu.utils.closure import explicit_closure


def main():
    n, d, mbar = 1_000_000, 4, 32
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    xg = [np.linspace(0, 1, mbar).astype(np.float32) for _ in range(d)]
    m = GPSKIRegression(
        x, y, [make_kernel("rbf", lengthscale=0.3) for _ in range(d)], xg,
        noise_var=0.05, solver="lattice", num_probes=8, lanczos_iters=30,
    )
    sigma2 = jnp.exp(m.params["log_noise"])
    factors = cov_grid(m.params["kernels"], m.xg, dim_noise_var=m.dim_noise_var)
    Qs, wjs, _ = m._lattice_spectra(factors, sigma2)
    # _make_lattice_ops now returns safe_batch_op-wrapped operators, so the
    # raw (bug-reproducing) composition is rebuilt UNWRAPPED here.
    from gp_grief_tpu.ops.kron_fast import kron_matvec_fast

    QsT = tuple(Q.T for Q in Qs)
    mv_s, rmv_s = m._w_ops
    cbar = m._lattice_cbar()

    def msqrt_raw(v_bm):
        B = v_bm.shape[0]
        eyeB = jnp.eye(B, dtype=v_bm.dtype)
        t = kron_matvec_fast((eyeB, *QsT), v_bm.reshape(-1)).reshape(B, -1)
        t = t * wjs[None, :]
        return kron_matvec_fast((eyeB, *Qs), t.reshape(-1)).reshape(B, -1)

    def white_raw(v_bm):  # unwrapped double-diamond composition
        u = msqrt_raw(v_bm)
        return v_bm + msqrt_raw(rmv_s(mv_s(u)) - cbar * u)

    M = int(np.prod([len(g) for g in xg]))
    _colsum, _colnorm, _bc = _reducers("bm", None)

    def run(V0):
        def body(vv, _):
            w = white_raw(vv)
            nrm = _colnorm(w)
            return w / _bc(jnp.where(nrm == 0, 1.0, nrm)), nrm

        return lax.scan(body, V0, None, length=30)

    for B in (2, 5, 8, 9, 10, 11, 12, 16, 24):
        V0 = jax.random.rademacher(jax.random.PRNGKey(3), (B, M), dtype=jnp.float32)
        p, c = explicit_closure(run, jax.ShapeDtypeStruct(V0.shape, V0.dtype))
        f = jax.jit(p)
        ref = [np.asarray(a) for a in f(c, V0)]
        res = []
        for _ in range(3):
            out = [np.asarray(a) for a in f(c, V0)]
            res.append(
                np.array_equal(ref[0], out[0], equal_nan=True)
                and np.array_equal(ref[1], out[1], equal_nan=True)
            )
        print(f"white B={B}: deterministic={res}", flush=True)


if __name__ == "__main__":
    main()
