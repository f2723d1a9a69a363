"""Test configuration: CPU backend with a virtual 8-device mesh, float64 on.

Real-TPU behavior is exercised by bench.py and the driver's compile checks;
unit/behavior tests run on a virtual multi-device CPU so sharding paths are
covered without hardware.

Note: the environment's sitecustomize registers the axon TPU backend and calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so both
the env var AND the config entry must be forced back to cpu here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The suite builds hundreds of solver instances, each with its own jit cache
# entries (solvers are identity-hashed jit statics); on small-RAM/2-vCPU
# runners the accumulated XLA CPU executables eventually segfault the
# process.  Drop compiled caches between test modules — fresh problems
# recompile anyway, so this costs little.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
