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

# No persistent compilation cache under pytest: CPU compiles are fast,
# and long multi-graph test processes have segfaulted inside XLA's
# executable DESERIALIZATION when reading entries written by other
# topologies (1-device CLI runs / axon TPU runs share the directory).
# The cache exists to amortize the minutes-long REMOTE TPU compiles;
# tests don't need it.  Must be set before lorads_tpu is imported
# (lorads_tpu/__init__.py reads it).
os.environ.setdefault("LORADS_TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402  (already imported by sitecustomize; no-op)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
