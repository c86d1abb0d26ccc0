"""oneBD hot-path timings on the TPU: table transport + full lnprob.

Round-1 left oneBD at 75-89 walker-steps/s vs simult's ~400; the suspected
cost is the spline-table gather (ops/stopping.py eval_stopped).  This tool
A/Bs the gather vs the one-hot-matmul lookup in isolation and end-to-end.
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

from mcmctoffitting_tpu.models import onebd
from mcmctoffitting_tpu.ops.stopping import StoppingTable
from mcmctoffitting_tpu.sampler import make_logp_batch

key = jax.random.PRNGKey(0)
N = 200_000
W = 32


def steady(name, fn, *args, iters=3):
    t_c0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: first (compile+run) {time.perf_counter()-t_c0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return dt


def main():
    hardcore = "--hardcore" in sys.argv
    spec = onebd.default_spec(n_samples=N, hardcore=hardcore)
    problem = onebd.OneBDProblem(spec, n_runs=3)
    table = spec.stopping_table
    print(f"config: hardcore={hardcore} eD={spec.ed_binning.n} "
          f"x={spec.x_binning.n} chunk={spec.histogram_chunk}", flush=True)

    e = jax.random.uniform(key, (N,), minval=200.0, maxval=2300.0)

    for method in ("gather", "onehot"):
        fn = jax.jit(lambda ee, m=method: table.eval_stopped(ee, method=m))
        steady(f"eval_stopped[{method}] {N} samples", fn, e)

    # full lnprob, 32-walker batch (the sampler's inner block)
    rng = np.random.default_rng(0)
    observed = tuple(rng.poisson(150.0, w.n_bins).astype(np.float64)
                     for w in problem.windows)
    logp_batch = jax.jit(make_logp_batch(problem.make_log_prob_fn(observed)))
    thetas = jnp.tile(jnp.asarray(
        [1300.0, 80.0, 0.6, 5e4, 5e4, 5e4, 20.0, 20.0, 20.0],
        jnp.float32), (W, 1))
    keys = jax.random.split(key, W)
    dt = steady(f"oneBD lnprob x{W} walkers", logp_batch, thetas, keys)
    print(f"-> projected walker-steps/s at 256 walkers: "
          f"{W / dt / 1.0:.1f}", flush=True)


if __name__ == "__main__":
    main()
