"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is first imported anywhere, so it lives at the top of
conftest.py.  All tests run on CPU with 8 virtual devices so multi-chip
sharding (mesh, collectives) is exercised without TPU hardware.

Exception — the on-TPU tier: ``TMAR_TESTS_TPU=1 pytest -m tpu`` keeps the
real backend so ``tests/test_tpu.py`` can assert the Pallas kernels' actual
Mosaic lowerings and bf16 numerics on hardware (VERDICT r1 item 3).  Those
tests auto-skip on the CPU platform.
"""

import os

_TPU_TIER = os.environ.get("TMAR_TESTS_TPU") == "1"

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (CI env may point at TPU)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_TIER:
    # A sitecustomize may have pinned jax_platforms to a remote TPU backend at
    # interpreter start (overriding the env var); re-pin to cpu before any
    # backend is initialised.
    jax.config.update("jax_platforms", "cpu")
else:
    # persistent compile cache: TPU compiles through the tunnel are slow
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from tmar.core import create_mesh

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device CPU platform (unset TMAR_TESTS_TPU)")
    return create_mesh(8)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
