"""Profile the shipped grouped-cyclic chain pass-by-pass + precision variants."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax

from bench import _timed_loop
from gp_grief_tpu.utils import enable_compilation_cache

enable_compilation_cache()

D, MD = 5, 32
M = MD**D
rng = np.random.default_rng(0)
Ks = [
    jnp.asarray(rng.standard_normal((MD, MD)) / (2.2 * np.sqrt(MD)), dtype=jnp.float32)
    for _ in range(D)
]
G1 = jnp.kron(Ks[0], Ks[1])
G2 = jnp.kron(Ks[2], Ks[3])
v = jnp.asarray(rng.standard_normal((M,)), dtype=jnp.float32)
DEF, HI = lax.Precision.DEFAULT, lax.Precision.HIGHEST
X3 = lax.DotAlgorithmPreset.BF16_BF16_F32_X3


def rot(K, prec):
    def f(x):
        X = x.reshape(int(K.shape[1]), -1)
        return lax.dot_general(X, K, (((0,), (1,)), ((), ())), precision=prec).ravel()
    return f


def t(name, fn):
    tt = _timed_loop(fn, v, iters=30)
    print(f"{name:28s} {tt*1e3:7.3f} ms", flush=True)


t("wide1024 DEFAULT", rot(G1, DEF))
t("wide1024 X3", rot(G1, X3))
t("narrow32 DEFAULT", rot(Ks[4], DEF))
t("narrow32 HIGHEST", rot(Ks[4], HI))
t("narrow32 X3", rot(Ks[4], X3))
from gp_grief_tpu.ops.kron_fast import kron_matvec_fast

t("chain DEFAULT", lambda x: kron_matvec_fast(Ks, x, precision=DEF))
t("chain wideDEF+narrowHI",
  lambda x: rot(Ks[4], HI)(rot(G2, DEF)(rot(G1, DEF)(x))))
t("chain wideX3+narrowHI",
  lambda x: rot(Ks[4], HI)(rot(G2, X3)(rot(G1, X3)(x))))
