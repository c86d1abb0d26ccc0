"""Time the Taylor-path forward + one ensemble step on the TPU."""
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
from mcmctoffitting_tpu.models.forward import tof_spectrum

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)
theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
W = 32


def steady(name, fn, iters=3):
    t0 = time.perf_counter()
    float(jnp.sum(fn(jax.random.fold_in(key, 999))))
    print(f"{name}: first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        float(jnp.sum(fn(jax.random.fold_in(key, i))))
    print(f"{name}: steady {(time.perf_counter() - t0)/iters*1000:.1f} ms",
          flush=True)


f_fwd = jax.jit(lambda k: jax.vmap(lambda kk: tof_spectrum(
    kk, theta, spec, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4))(jax.random.split(k, W)))
steady("tof_spectrum taylor x32", f_fwd)

# full lnprob x32 (4 runs)
obs = tuple(np.random.default_rng(0).poisson(200.0, w.n_bins).astype(
    np.float64) for w in problem.windows)
logp = problem.make_log_prob_fn(obs)
th9 = jnp.concatenate([theta, jnp.full(4, 5e4)])
f_lp = jax.jit(lambda k: jax.vmap(logp)(
    jnp.tile(th9, (W, 1)), jax.random.split(k, W)))
steady("lnprob x32 (4 runs)", f_lp)

# one full ensemble step, 256 walkers, chunk 32
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc
logp_batch = make_logp_batch(logp, chunk=32)
p0 = problem.initial_walkers_from_observed(key, 256, obs)
t0 = time.perf_counter()
state = init_state(jax.random.PRNGKey(1), p0, logp_batch)
jax.block_until_ready(state.log_probs)
print(f"init 256 walkers: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
chain = run_mcmc(state, 1, logp_batch)
jax.block_until_ready(chain.positions)
print(f"step1 (compile+run): {time.perf_counter() - t0:.1f}s", flush=True)
state = chain.state
t0 = time.perf_counter()
chain = run_mcmc(state, 1, logp_batch)
jax.block_until_ready(chain.positions)
dt = time.perf_counter() - t0
print(f"step2 steady: {dt:.2f}s -> {256/dt:.1f} walker-steps/s", flush=True)
