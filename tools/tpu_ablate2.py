"""Follow-up ablation: run-axis sequencing x walker chunk at 200k draws.

The 200k-draw 4-run block is superlinear in the (walker x run x sample)
working set (tpu_ablate_simult.py); this measures whether sequencing the
run axis and/or shrinking the walker chunk recovers the linear regime —
for simult AND oneBD.
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

s_base = simult.default_spec(n_samples=200_000)
s_seq = dataclasses.replace(s_base, run_axis="sequential")
s_seq8k = dataclasses.replace(s_seq, histogram_chunk=8192)

time_block("simult seq W=32", simult.SimultFitProblem(s_seq, 4), S_THETA, 32)
time_block("simult seq+8k W=32", simult.SimultFitProblem(s_seq8k, 4),
           S_THETA, 32)
time_block("simult batched W=16",
           simult.SimultFitProblem(s_base, 4), S_THETA, 16)
time_block("simult seq W=64", simult.SimultFitProblem(s_seq, 4), S_THETA, 64)

o_base = onebd.default_spec(n_samples=200_000)
o_seq = dataclasses.replace(o_base, run_axis="sequential")
time_block("onebd seq W=32", onebd.OneBDProblem(o_seq, 3), O_THETA, 32)
o_hc = onebd.default_spec(n_samples=200_000, hardcore=True)
o_hc_seq = dataclasses.replace(o_hc, run_axis="sequential")
time_block("onebd-hc seq W=32", onebd.OneBDProblem(o_hc_seq, 3), O_THETA, 32)
time_block("onebd-hc batched W=32", onebd.OneBDProblem(o_hc, 3), O_THETA, 32)
