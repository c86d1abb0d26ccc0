"""Steady-state timing of the cached 32-walker lnprob program."""
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

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)
obs = tuple(np.random.default_rng(0).poisson(200.0, w.n_bins).astype(
    np.float64) for w in problem.windows)
logp = problem.make_log_prob_fn(obs)
theta = jnp.concatenate([jnp.asarray([1878.4, 850.0, 170.0, 0.5]),
                         jnp.full(4, 5e4)])

for nw in (32,):
    thetas = jnp.tile(theta, (nw, 1))
    keys = jax.random.split(key, nw)
    vm = jax.jit(jax.vmap(logp))
    t0 = time.perf_counter()
    out = vm(thetas, keys)
    jax.block_until_ready(out)
    print(f"x{nw} first: {time.perf_counter() - t0:.2f}s", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        out = vm(thetas, jax.random.split(jax.random.fold_in(key, i), nw))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"x{nw} steady: {dt:.3f}s -> {nw/dt:.1f} lnprob/s", flush=True)
