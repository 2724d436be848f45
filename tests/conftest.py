"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Parity tests run in float64 on the CPU backend (SURVEY.md §7 hard-part 1:
TPUs have no fast f64, so exact-GP parity math is validated here while the
TPU path runs f32/bf16).  The 8 virtual devices exercise ``shard_map``
collectives without a real pod (SURVEY.md §4 item 4).
"""

import os

# Virtual-device flag must be set before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS from the environment, so pin the platform via config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-dominated (CG/SLQ/eigh
# programs); repeat runs skip every recompile (~10 min cold -> ~3 min warm).
from gp_grief_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
