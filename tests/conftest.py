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

import gc

import jax  # noqa: E402
import pytest  # noqa: E402

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


def _vm_map_count() -> int:
    """Number of memory mappings this process holds (see vm.max_map_count)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux; the guard below becomes a no-op
        return 0


# The full suite runs ~200 tests in ONE process; accumulated executables,
# cached operator tables and allocator fragmentation can exhaust the
# kernel's vm.max_map_count (65530 here), after which LLVM's JIT dies with
# "Cannot allocate memory" mid-compile.  When the count nears the limit,
# drop every cache we own and let the persistent compile cache make the
# recompiles cheap.
_MAP_GUARD_THRESHOLD = int(os.environ.get("MCMC_TPU_MAP_GUARD", "45000"))
_MAP_LOG = os.environ.get("MCMC_TPU_MAP_LOG", "")


def _clear_all_caches() -> None:
    from mcmctoffitting_tpu.models import onebd, simult
    from mcmctoffitting_tpu.ops import e0grid

    jax.clear_caches()
    e0grid.cached_e0_grid_table.cache_clear()
    simult._build_table.cache_clear()
    onebd._build_table.cache_clear()
    gc.collect()


@pytest.fixture(autouse=True)
def _vm_map_guard(request):
    yield
    n = _vm_map_count()
    if _MAP_LOG:
        with open(_MAP_LOG, "a") as f:
            f.write(f"{n}\t{request.node.nodeid}\n")
    if n > _MAP_GUARD_THRESHOLD:
        _clear_all_caches()
        if _MAP_LOG:
            with open(_MAP_LOG, "a") as f:
                f.write(f"{_vm_map_count()}\tAFTER-CLEAR\n")
