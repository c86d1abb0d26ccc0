"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  Set env vars
before anything imports jax.
"""
import os

# force CPU: the ambient environment sets JAX_PLATFORMS=axon (a remote TPU
# tunnel with remote compilation) which makes unit tests slow and flaky
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# pytest autoloads a plugin that imports jax BEFORE this conftest, so the
# env var above can be too late; override the already-read config directly
# (backends are initialized lazily, so this still takes effect here)
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)  # match TPU f32 defaults in tests

# this host's XLA compiles have large wall-clock overheads; persist compiled
# executables across pytest processes so reruns only pay for new shapes
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_cpu")  # separate from the TPU cache
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
