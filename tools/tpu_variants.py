"""One-shot TPU diagnostic: calibration + forward-model variants.

All timings force host materialization via float(jnp.sum(out)).  Each
variant is a separate compile (minutes each over the remote-compile
tunnel), so everything runs in one process to amortize startup.
"""
import dataclasses
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
from mcmctoffitting_tpu.ops.xs import ddn_xs, ddn_xs_uniform

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)
theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
W = 32


def steady(name, fn, iters=2):
    t0 = time.perf_counter()
    float(jnp.sum(fn(jax.random.fold_in(key, 999))))
    print(f"{name}: first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        float(jnp.sum(fn(jax.random.fold_in(key, i))))
    print(f"{name}: steady {(time.perf_counter() - t0)/iters*1000:.1f} ms",
          flush=True)


# 0) calibration: known-cost matmul, 137 GFLOP
steady("matmul 4096^3", jax.jit(
    lambda k: (lambda a: a @ a)(jax.random.normal(k, (4096, 4096)))))

# 1) searchsorted alone at hot-path scale
knots = jnp.asarray(ddn_xs.knots, jnp.float32)
steady("searchsorted 64M", jax.jit(
    lambda k: jnp.searchsorted(
        knots, 1200.0 - 1000.0 * jax.random.uniform(k, (W, 10, 200_000)),
        side="right").astype(jnp.float32)))

# 2) original (searchsorted) XS spline
steady("xs original 64M", jax.jit(
    lambda k: ddn_xs(1200.0 - 1000.0
                     * jax.random.uniform(k, (W, 10, 200_000)))))

# 3) uniform (arithmetic-index) XS spline
steady("xs uniform 64M", jax.jit(
    lambda k: ddn_xs_uniform(1200.0 - 1000.0
                             * jax.random.uniform(k, (W, 10, 200_000)))))

# 4) full forward with the NEW default (uniform xs + arithmetic table)
f_new = jax.jit(lambda k: jax.vmap(lambda kk: tof_spectrum(
    kk, theta, spec, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4))(jax.random.split(k, W)))
steady("tof_spectrum NEW x32", f_new)

# 5) forward with weights forced to 1 (isolates the xs contribution)
class OnesXS:
    def __call__(self, e):
        return jnp.ones_like(e)
    def __hash__(self):
        return 1
    def __eq__(self, o):
        return isinstance(o, OnesXS)

spec_ones = dataclasses.replace(spec, xs=OnesXS())
f_ones = jax.jit(lambda k: jax.vmap(lambda kk: tof_spectrum(
    kk, theta, spec_ones, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4))(jax.random.split(k, W)))
steady("tof_spectrum onesXS x32", f_ones)

print("DONE", flush=True)
