"""Find the best walker-chunk size for the ensemble step on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)
obs = tuple(np.random.default_rng(0).poisson(200.0, w.n_bins).astype(
    np.float64) for w in problem.windows)
logp = problem.make_log_prob_fn(obs)
p0 = problem.initial_walkers_from_observed(key, 256, obs)

for chunk in (32, 64, 128):
    try:
        logp_batch = make_logp_batch(logp, chunk=chunk)
        state = init_state(jax.random.PRNGKey(1), p0, logp_batch)
        jax.block_until_ready(state.log_probs)
        chain = run_mcmc(state, 1, logp_batch)  # compile
        jax.block_until_ready(chain.positions)
        state = chain.state
        t0 = time.perf_counter()
        chain = run_mcmc(state, 1, logp_batch)
        jax.block_until_ready(chain.positions)
        dt = time.perf_counter() - t0
        print(f"chunk {chunk}: {dt:.2f}s/step -> "
              f"{256/dt:.1f} walker-steps/s", flush=True)
    except Exception as e:
        print(f"chunk {chunk}: FAILED {type(e).__name__}: {e}", flush=True)
        time.sleep(20)
