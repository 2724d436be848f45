"""Round-3 probe: Mosaic in-kernel dynamic gather capabilities.

`jax.lax.gather` lowers in Pallas TPU kernels ONLY as `tpu.dynamic_gather`
with table/indices/output all the SAME 2D shape (jax mosaic lowering.py:
_gather_lowering_rule): `out[i, j] = x[i, idx[i, j]]` via
`jnp.take_along_axis(x, idx, axis=1)` where `idx.shape == x.shape`.

The open question for the SKI slot-gather (table u is (B, 100k), 3.6 MB
VMEM-resident; 75M gathered elements per matvec): can the gathered row span
MULTIPLE 128-lane vregs (indices range over the full row), or is the
permute limited to within one vreg?  Ladder over widths; check correctness
against XLA.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/exp_r3_mosaic_gather.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe_same_shape(width: int, rows: int = 8, axis: int = 1):
    rng = np.random.default_rng(0)
    shape = (rows, width) if axis == 1 else (width, rows)
    u = jnp.asarray(rng.standard_normal(shape).astype("float32"))
    hi = shape[axis]
    idx = jnp.asarray(rng.integers(0, hi, size=shape), jnp.int32)

    def kern(u_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(u_ref[...], idx_ref[...], axis=axis)

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    got = fn(u, idx)
    ref = jnp.take_along_axis(u, idx, axis=axis)
    ok = bool(jnp.all(got == ref))
    print(f"  axis={axis} shape={shape}: compiled, correct={ok}", flush=True)
    return ok


def main():
    print("same-shape take_along_axis, axis=1 (lane gather):", flush=True)
    for width in (128, 256, 1024, 8192, 100_096):
        try:
            if not probe_same_shape(width, axis=1):
                break
        except Exception as e:  # noqa: BLE001
            msg = " | ".join(l for l in str(e).split("\n") if l.strip())[:300]
            print(f"  width={width}: FAILED — {msg}", flush=True)
            break
    print("same-shape take_along_axis, axis=0 (sublane gather):", flush=True)
    for width in (8, 16, 512, 8192):
        try:
            if not probe_same_shape(width, axis=0):
                break
        except Exception as e:  # noqa: BLE001
            msg = " | ".join(l for l in str(e).split("\n") if l.strip())[:300]
            print(f"  width={width}: FAILED — {msg}", flush=True)
            break


if __name__ == "__main__":
    main()
