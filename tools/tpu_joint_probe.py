"""Decompose the counts-mode JOINT logp cost at production shapes (r4b).

tools/tpu_chain_probe3.py showed joint logp (4 runs) = 7.95 ms/iter at
W=1024 while its constituent stages sum to ~4 ms: 4 x grid_and_mean
(0.59 net each) + a batched 4-run TOF stage (~4 x 0.35) + likelihood.
This probe times the intermediate compositions to locate the gap:

  A. lax.map of 4 x grid_and_mean (the sequential run axis, grids only)
  B. vmap   of 4 x grid_and_mean (the batched run axis, grids only)
  C. tof_spectra_multi (grids + batched TOF + convolutions, 4 runs)
  D. full logp (C + compound Poisson likelihood + prior)

Usage: python tools/tpu_joint_probe.py [--walkers W] [--chain N]
"""
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
from mcmctoffitting_tpu.models.forward import grid_and_mean, \
    tof_spectra_multi
from mcmctoffitting_tpu.utils import data_io


def _arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


CHAIN = _arg("--chain", 256)
W = _arg("--walkers", 1024)

spec = simult.default_spec(n_samples=200_000, sampling="counts")
problem = simult.SimultFitProblem(spec, n_runs=4, likelihood="poisson")
key = jax.random.PRNGKey(0)
truth = np.concatenate([[1878.4, 850.0, 170.0, 0.5], [5e4] * 4])
theta_full = jnp.asarray(truth, jnp.float32)
observed = data_io.synthesize_observed(jax.random.fold_in(key, 9), problem,
                                       truth)
logp = problem.make_log_prob_fn(observed)
print(f"simult counts joint decomposition: W={W} F={spec.e0_grid_fine} "
      f"CHAIN={CHAIN}", flush=True)


def chained(per_key, w=W):
    d = int(theta_full.shape[0])
    jit_rel = 1e-4 * jax.random.normal(jax.random.PRNGKey(42), (w, d))

    def run(k, p):
        def body(carry, i):
            th = p[None, :] * (1.0 + jit_rel + carry * 1e-20)
            ks = jax.random.split(jax.random.fold_in(k, i), w)
            out = jax.vmap(per_key)(ks, th)
            return jnp.sum(out * out) ** 0.5 * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    return jax.jit(run).lower(key, theta_full).compile()


def steady(name, compiled, iters=2, w=W):
    float(compiled(jax.random.fold_in(key, 999), theta_full))
    t0 = time.perf_counter()
    for i in range(iters):
        float(compiled(jax.random.fold_in(key, i), theta_full))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{name} x{w}: {dt:.3f} ms/iter", flush=True)
    return dt


def grids_seq(k, th):
    keys = jax.random.split(k, 4)
    g, m = jax.lax.map(lambda kk: grid_and_mean(spec, th[:4], kk), keys)
    return jnp.sum(g) + jnp.sum(m)


def grids_bat(k, th):
    keys = jax.random.split(k, 4)
    g, m = jax.vmap(lambda kk: grid_and_mean(spec, th[:4], kk))(keys)
    return jnp.sum(g) + jnp.sum(m)


def multi(k, th):
    keys = jax.random.split(k, 4)
    specs = tof_spectra_multi(keys, th[:4], spec, problem.standoffs,
                              problem.windows, th[4:8])
    return sum(jnp.sum(s) for s in specs)


steady("A grids sequential (lax.map x4)", chained(grids_seq))
steady("B grids batched    (vmap x4)   ", chained(grids_bat))
steady("C tof_spectra_multi (4 runs)   ", chained(multi))
steady("D full joint logp               ", chained(lambda k, p: logp(p, k)))
