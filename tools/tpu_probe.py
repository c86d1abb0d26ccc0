"""Staged TPU smoke test: find which piece of the forward path faults."""
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

print("devices:", jax.devices(), flush=True)


def stage(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[OK] {name}: {time.perf_counter() - t0:.2f}s", flush=True)
        return out
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        raise SystemExit(1)


from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.models.forward import tof_spectrum
from mcmctoffitting_tpu.ops.histogram import weighted_histogram
from mcmctoffitting_tpu.ops.stopping import rk4_transport

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)

# stage 1: basic ops
stage("arange+sum", lambda: jnp.sum(jnp.arange(1024.0)))
stage("random.normal 200k", lambda: jax.random.normal(key, (200_000,)))
stage("random.poisson", lambda: jax.random.poisson(key, 20.0, (50,)))

# stage 2: transport
e0 = jnp.linspace(600.0, 1200.0, 200_000)
stage("rk4_transport 200k x 10",
      lambda: jax.jit(lambda e: rk4_transport(
          spec.stopping.dedx, e, spec.x_binning.centers))(e0))

# stage 3: histogram
vals = jax.random.uniform(key, (10, 200_000), minval=200.0, maxval=1200.0)
w = jnp.ones((10, 200_000))
stage("weighted_histogram (10,200k)->50",
      lambda: jax.jit(lambda v, ww: weighted_histogram(
          v, 200.0, 1200.0, 50, ww, chunk=16384))(vals, w))

# stage 4: one full forward spectrum
theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
fwd = jax.jit(lambda k, t: tof_spectrum(
    k, t, spec, problem.standoffs[0], problem.windows[0], get_pdf=True,
    scale=5e4))
stage("tof_spectrum 200k", lambda: fwd(key, theta))

# stage 5: one full lnprob (4 runs)
obs = tuple(np.random.default_rng(0).poisson(200.0, wdw.n_bins).astype(
    np.float64) for wdw in problem.windows)
logp = problem.make_log_prob_fn(obs)
th9 = jnp.concatenate([theta, jnp.full(4, 5e4)])
jl = jax.jit(logp)
stage("lnprob 4 runs", lambda: jl(th9, key))

# stage 6: vmapped lnprob over 8, 32 walkers
for nw in (8, 32):
    thetas = jnp.tile(th9, (nw, 1))
    keys = jax.random.split(key, nw)
    vm = jax.jit(jax.vmap(logp))
    stage(f"vmap lnprob x{nw}", lambda: vm(thetas, keys))

# stage 7: one ensemble step, 64 walkers chunk 32
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc
logp_batch = make_logp_batch(logp, chunk=32)
p0 = problem.initial_walkers_from_observed(key, 64, obs)
state = stage("init_state 64 walkers",
              lambda: init_state(jax.random.PRNGKey(1), p0, logp_batch))
chain = stage("run_mcmc 1 step 64 walkers",
              lambda: run_mcmc(state, 1, logp_batch))
print("ALL STAGES OK", flush=True)
