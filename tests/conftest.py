"""Test env: force CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs multichip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize forces jax_platforms="axon,cpu"; tests must run on
# the virtual 8-device CPU backend regardless
jax.config.update("jax_platforms", "cpu")
# The full suite loads thousands of XLA:CPU executables and the process
# walks into the kernel's vm.max_map_count (default 65530): the mmap
# failure surfaces as a SEGFAULT inside backend_compile_and_load /
# deserialize_executable, 6/6 at the same suite position (maps sampled
# at 65164/65530 at the crash instant). Raise the limit when we can;
# the per-module cache clear below keeps map growth bounded regardless.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as f:
        if int(f.read()) < 262144:
            f.seek(0)
            f.write("262144")
except (OSError, PermissionError):
    pass

# CPU-only cache dir, never shared with the TPU benches' cache
jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_executables():
    """Free dropped compiled executables between test modules.

    Each loaded XLA:CPU executable holds several memory mappings; the
    full suite otherwise accumulates ~65k maps and segfaults at the
    kernel's vm.max_map_count (see header note). Cross-module recompiles
    are served from the persistent cache, so this costs seconds.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
