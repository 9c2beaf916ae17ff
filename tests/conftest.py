"""Test harness config: virtual 8-device CPU mesh + float64 enabled.

The host environment pins JAX_PLATFORMS to the TPU plugin; tests must run
on CPU (f64 golden paths + virtual multi-device meshes), so we override via
jax.config before any backend is initialized.

TPU lane: ``MTPU_TPU_TESTS=1 pytest tests -m tpu`` keeps the host's TPU
backend and runs only the ``@pytest.mark.tpu`` subset (real-chip Pallas
parity + pipeline smoke). Without the env opt-in, tpu-marked tests are
skipped and everything else runs on the CPU harness as before.
"""

import os

import pytest

TPU_LANE = os.environ.get("MTPU_TPU_TESTS") == "1"

if not TPU_LANE:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_ENABLE_X64"] = "true"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on real TPU hardware (MTPU_TPU_TESTS=1)")
    config.addinivalue_line(
        "markers", "smoke: seconds-fast pre-commit tier "
        "(pytest -m smoke, one test per subsystem, < 60 s total)")


def pytest_collection_modifyitems(config, items):
    skip_cpu = pytest.mark.skip(
        reason="TPU lane active: only @pytest.mark.tpu tests run")
    skip_tpu = pytest.mark.skip(
        reason="needs MTPU_TPU_TESTS=1 on a TPU host")
    for item in items:
        is_tpu = "tpu" in item.keywords
        if TPU_LANE and not is_tpu:
            item.add_marker(skip_cpu)
        elif not TPU_LANE and is_tpu:
            item.add_marker(skip_tpu)
