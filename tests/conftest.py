"""Test configuration: force an 8-device virtual CPU mesh + f64.

Multi-chip logic is validated on CPU per SURVEY.md §4.  This image
pins JAX to the remote-compile 'axon' TPU platform via a sitecustomize
hook that imports jax at interpreter startup — which freezes the
JAX_PLATFORMS env var into jax.config.  Mutating os.environ is
therefore too late, but jax.config.update("jax_platforms", ...) still
works as long as no backend has been initialized.  XLA_FLAGS is read
lazily at backend init, so setting it here is fine.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; no-op)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
