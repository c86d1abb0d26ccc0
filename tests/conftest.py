"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  Set env vars
before anything imports jax.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)  # match TPU f32 defaults in tests
