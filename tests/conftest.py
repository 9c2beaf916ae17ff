"""Test harness config: virtual 8-device CPU mesh + float64 enabled.

The host environment pins JAX_PLATFORMS to the TPU plugin; tests must run
on CPU (f64 golden paths + virtual multi-device meshes), so we override via
jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
