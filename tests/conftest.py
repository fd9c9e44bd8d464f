"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-native "fake backend" for multi-device tests (SURVEY.md §4):
all unit/kernel/integration tests run on CPU with 8 virtual devices so the
pjit/sharding paths are exercised without TPU hardware. Pallas kernels run
in interpret mode on CPU (handled inside hocon.render).
"""

import os

# NOTE: env vars are NOT enough here — the jaxtyping pytest plugin imports
# jax before this conftest runs, and jax snapshots JAX_PLATFORMS at import.
# config.update after import is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
# Child processes (grain workers, subprocess-based tests) must not register
# a TPU PJRT plugin at interpreter start: registration hangs in a retry
# loop whenever the tunnel's control plane is down, and CPU tests never
# need the device. This mutation only affects children — the test process
# itself latched its env before conftest ran (see NOTE above).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # unit tests never touch the TPU tunnel
jax.config.update("jax_num_cpu_devices", 8)  # virtual 8-device mesh for pjit tests
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: this sandbox has a single CPU core, so XLA
# compiles dominate test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/hocon_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Cache only the JAX-level artifacts: the XLA:CPU AOT cache embeds host
# machine features and warns/SIGILLs when the sandbox migrates hosts.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import tempfile  # noqa: E402

# Dataset-level disk caches (synthetic render frames, HO-3D fit-vertex
# memmaps) must not leak into the user's ~/.cache from tests.
_cache_tmp = tempfile.mkdtemp(prefix="hocon_test_cache_")
os.environ.setdefault("HOCON_CACHE_DIR", _cache_tmp)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mano_model():
    from hocon.geometry.mano import synthetic_mano_model

    return synthetic_mano_model(seed=0)
