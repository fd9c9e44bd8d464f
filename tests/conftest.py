"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-native "fake backend" for multi-device tests (SURVEY.md §4):
all unit/kernel/integration tests run on CPU with 8 virtual devices so the
pjit/sharding paths are exercised without TPU hardware. Pallas kernels run
in interpret mode on CPU (handled inside hocon.render).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: unit tests never run on TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mano_model():
    from hocon.geometry.mano import synthetic_mano_model

    return synthetic_mano_model(seed=0)
