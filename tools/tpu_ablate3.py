"""Final knob sweep: walker-chunk and histogram-chunk under sequential
run-axis, for simult and oneBD (200k draws)."""
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

from mcmctoffitting_tpu.models import onebd, simult
from mcmctoffitting_tpu.sampler import make_logp_batch

key = jax.random.PRNGKey(0)


def time_block(name, problem, theta_row, w, iters=6):
    rng = np.random.default_rng(0)
    observed = tuple(rng.poisson(200.0, win.n_bins).astype(np.float64)
                     for win in problem.windows)
    logp_batch = jax.jit(make_logp_batch(problem.make_log_prob_fn(observed)))
    thetas = jnp.tile(jnp.asarray(theta_row, jnp.float32), (w, 1))
    t0 = time.perf_counter()
    out = logp_batch(thetas, jax.random.split(key, w))
    jax.block_until_ready(out)
    print(f"{name}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        out = logp_batch(thetas, jax.random.split(
            jax.random.fold_in(key, i), w))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms for {w} walkers "
          f"(-> {w / dt * 1000:.0f} proj wsps)", flush=True)


S_THETA = [1878.4, 850.0, 170.0, 0.5, 5e4, 5e4, 5e4, 5e4]
O_THETA = [1300.0, 80.0, 0.6, 5e4, 5e4, 5e4, 20.0, 20.0, 20.0]

s = dataclasses.replace(simult.default_spec(n_samples=200_000),
                        run_axis="sequential", histogram_chunk=8192)
time_block("simult seq+8k W=64", simult.SimultFitProblem(s, 4), S_THETA, 64)
time_block("simult seq+8k W=128", simult.SimultFitProblem(s, 4), S_THETA,
           128)
s16k = dataclasses.replace(s, histogram_chunk=16384)
time_block("simult seq+16k W=64", simult.SimultFitProblem(s16k, 4),
           S_THETA, 64)

o = dataclasses.replace(onebd.default_spec(n_samples=200_000),
                        run_axis="sequential")
time_block("onebd seq(2k) W=64", onebd.OneBDProblem(o, 3), O_THETA, 64)
o4k = dataclasses.replace(o, histogram_chunk=4096)
time_block("onebd seq+4k W=32", onebd.OneBDProblem(o4k, 3), O_THETA, 32)
o8k = dataclasses.replace(o, histogram_chunk=8192)
time_block("onebd seq+8k W=32", onebd.OneBDProblem(o8k, 3), O_THETA, 32)
time_block("onebd seq+8k W=64", onebd.OneBDProblem(o8k, 3), O_THETA, 64)

hc = dataclasses.replace(
    onebd.default_spec(n_samples=200_000, hardcore=True),
    run_axis="sequential", histogram_chunk=2048)
time_block("onebd-hc seq+2k W=32", onebd.OneBDProblem(hc, 3), O_THETA, 32)
hc4k = dataclasses.replace(hc, histogram_chunk=4096)
time_block("onebd-hc seq+4k W=32", onebd.OneBDProblem(hc4k, 3), O_THETA, 32)
