"""Round-2 simult stage timings on TPU (post table-transport).

Answers: where do the ~53 ms per 32-walker lnprob block go, given oneBD
(table transport, 2x the eD bins) runs the same block in ~36 ms?
"""
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
from mcmctoffitting_tpu.models.forward import (energy_weight_grid,
                                               sample_beam_energies,
                                               tof_spectrum,
                                               tof_spectra_multi)
from mcmctoffitting_tpu.sampler import make_logp_batch

key = jax.random.PRNGKey(0)
W = 32
N = 200_000
spec = simult.default_spec(n_samples=N)
problem = simult.SimultFitProblem(spec, n_runs=4)
theta4 = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)


def steady(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms",
          flush=True)
    return out


keys = jax.random.split(key, W)

f_draw = jax.jit(jax.vmap(lambda k: sample_beam_energies(k, spec, theta4)))
e0 = steady("beam draw (truncated) x32", f_draw, keys)

f_tab = jax.jit(jax.vmap(lambda e: spec.stopping_table.eval_stopped(e)))
steady("table transport x32", f_tab, e0)

f_grid = jax.jit(jax.vmap(lambda e: energy_weight_grid(spec, e)))
steady("energy_weight_grid (stream moments) x32", f_grid, e0)

f_fwd1 = jax.jit(jax.vmap(lambda k: tof_spectrum(
    k, theta4, spec, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4)))
steady("tof_spectrum 1 run x32", f_fwd1, keys)

f_fwd4 = jax.jit(jax.vmap(lambda k: tof_spectra_multi(
    [jax.random.fold_in(k, r) for r in range(4)], theta4, spec,
    problem.standoffs, problem.windows, jnp.full(4, 5e4))[0]))
steady("tof_spectra_multi 4 runs x32", f_fwd4, keys)

rng = np.random.default_rng(0)
observed = tuple(rng.poisson(200.0, w.n_bins).astype(np.float64)
                 for w in problem.windows)
logp_batch = jax.jit(make_logp_batch(problem.make_log_prob_fn(observed)))
thetas = jnp.tile(jnp.concatenate([theta4, jnp.full(4, 5e4)]), (W, 1))
dt = steady("simult lnprob x32", logp_batch, thetas, keys)
