"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is first imported anywhere, so it lives at the top of
conftest.py.  All tests run on CPU with 8 virtual devices so multi-chip
sharding (mesh, collectives) is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (CI env may point at TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize may have pinned jax_platforms to a remote TPU backend at
# interpreter start (overriding the env var); re-pin to cpu before any
# backend is initialised.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from tmar.core import create_mesh

    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return create_mesh(8)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
