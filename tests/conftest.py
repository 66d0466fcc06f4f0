"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX fake-backend trick).

Note: this environment registers the TPU (axon) PJRT plugin in every Python
process via a sitecustomize hook that overrides ``jax_platforms`` — setting
the env var alone is not enough; we must update the config after import and
before any backend is initialized. Running tests on CPU also avoids blocking
on the single TPU chip's exclusive claim.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
