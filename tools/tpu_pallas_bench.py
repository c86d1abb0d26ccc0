"""Compare XLA vs fused-Pallas forward on the real TPU."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.models.forward import energy_weight_grid

key = jax.random.PRNGKey(0)
W = 32
spec = simult.default_spec(n_samples=200_000)
spec_p = dataclasses.replace(spec, use_pallas=True)


def steady(name, fn, iters=3):
    t0 = time.perf_counter()
    float(jnp.sum(fn(jax.random.fold_in(key, 999))))
    print(f"{name}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        float(jnp.sum(fn(jax.random.fold_in(key, i))))
    print(f"{name}: steady {(time.perf_counter()-t0)/iters*1000:.1f} ms",
          flush=True)


def mk(k):
    return 500.0 + 700.0 * jax.random.uniform(k, (W, 200_000))


steady("XLA grid x32", jax.jit(
    lambda k: jax.vmap(lambda e: energy_weight_grid(spec, e))(mk(k))))
steady("Pallas grid x32", jax.jit(
    lambda k: jax.vmap(lambda e: energy_weight_grid(spec_p, e))(mk(k))))
