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


# Seconds-fast pre-commit tier (`pytest -m smoke`, < 60 s total): one
# representative test per subsystem, defined centrally so the tier stays
# curated. Bare function name = every parametrization; name[param] = one.
SMOKE_TESTS = {
    "test_detect.py::test_block_matches_oracle_f32",
    "test_bh_count.py::test_count_matches_sort_full_surface[256-64-7]",
    "test_normalize.py::test_global_regime_matches_oracle",
    "test_bandnorm.py::test_device_band_matches_host[900-120-5000]",
    "test_cool.py::test_fetch_band_roundtrip",
    "test_hic.py::test_fetch_roundtrip[False-8]",
    "test_hicpro.py::test_hicpro_matches_text_triplets",
    "test_manifest.py::test_manifest_roundtrip",
    "test_kernels.py::test_blur_ladder_matches_scipy",
    "test_kernels.py::test_bh_logq_matches_statsmodels_formula[1000]",
    "test_diff.py::test_find_diff_loops_api",
    "test_config.py",
}


def _is_smoke(nodeid: str) -> bool:
    rel = nodeid.split("/")[-1]
    base = rel.split("[")[0]
    return rel in SMOKE_TESTS or base in SMOKE_TESTS \
        or base.split("::")[0] in SMOKE_TESTS


def pytest_collection_modifyitems(config, items):
    skip_cpu = pytest.mark.skip(
        reason="TPU lane active: only @pytest.mark.tpu tests run")
    skip_tpu = pytest.mark.skip(
        reason="needs MTPU_TPU_TESTS=1 on a TPU host")
    for item in items:
        if _is_smoke(item.nodeid):
            item.add_marker(pytest.mark.smoke)
        is_tpu = "tpu" in item.keywords
        if TPU_LANE and not is_tpu:
            item.add_marker(skip_cpu)
        elif not TPU_LANE and is_tpu:
            item.add_marker(skip_tpu)
