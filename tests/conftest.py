"""Test configuration: force an 8-device virtual CPU mesh + f64.

Multi-chip logic is validated on CPU per SURVEY.md §4: set
XLA_FLAGS=--xla_force_host_platform_device_count=8 and JAX_PLATFORMS=cpu
BEFORE jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
