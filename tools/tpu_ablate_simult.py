"""Ablation timing of the simult lnprob block: find what actually binds.

Times the end-to-end 32-walker lnprob (fresh keys per iteration) under
one-variable-at-a-time spec changes.  Stage timings measured in isolation
did not compose (cutting the draw + table work barely moved the bench),
so this measures the variants that matter end-to-end.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.sampler import make_logp_batch

key = jax.random.PRNGKey(0)
W = 32


def time_variant(name, spec, n_runs=4, iters=6):
    problem = simult.SimultFitProblem(spec, n_runs=n_runs)
    rng = np.random.default_rng(0)
    observed = tuple(rng.poisson(200.0, w.n_bins).astype(np.float64)
                     for w in problem.windows)
    logp_batch = jax.jit(make_logp_batch(problem.make_log_prob_fn(observed)))
    thetas = jnp.tile(jnp.asarray(
        [1878.4, 850.0, 170.0, 0.5] + [5e4] * n_runs, jnp.float32), (W, 1))
    t0 = time.perf_counter()
    out = logp_batch(thetas, jax.random.split(key, W))
    jax.block_until_ready(out)
    print(f"{name}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        out = logp_batch(thetas, jax.random.split(
            jax.random.fold_in(key, i), W))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms  (-> {8 * 256 / (8 * dt / 1000):.0f} "
          f"proj wsps)", flush=True)


base = simult.default_spec(n_samples=200_000)
time_variant("base (table, chunk 4096)", base)
time_variant("radix 8", dataclasses.replace(base, moment_radix=8))
time_variant("radix 16", dataclasses.replace(base, moment_radix=16))
time_variant("chunk 8192", dataclasses.replace(base, histogram_chunk=8192))
time_variant("chunk 16384", dataclasses.replace(base,
                                                histogram_chunk=16384))
time_variant("no zero-degree segs", dataclasses.replace(base,
                                                        zero_degree="none"))
time_variant("100k draws", simult.default_spec(n_samples=100_000))
time_variant("50k draws", simult.default_spec(n_samples=50_000))
time_variant("1 run", base, n_runs=1)
