"""Stage timing with FRESH inputs per iteration (defeats any exec cache)."""
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
from mcmctoffitting_tpu.models.forward import energy_weight_grid, tof_spectrum
from mcmctoffitting_tpu.ops.histogram import weighted_histogram
from mcmctoffitting_tpu.ops.stopping import rk4_transport

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)
W = 32


def steady_keyed(name, fn, iters=3):
    """fn(key) -> out; fresh key per call."""
    out = fn(jax.random.fold_in(key, 12345))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms", flush=True)


def mk_e0(k):
    return 600.0 + 600.0 * jax.random.uniform(k, (W, 200_000))


f_rk4 = jax.jit(lambda k: jax.vmap(lambda e: rk4_transport(
    spec.stopping.dedx, e, spec.x_binning.centers))(mk_e0(k)))
steady_keyed("rk4_transport x32 fresh", f_rk4)

f_xs = jax.jit(lambda k: spec.xs(1200.0 - 1000.0
                                 * jax.random.uniform(k, (W, 10, 200_000))))
steady_keyed("xs spline x32 fresh", f_xs)

f_hist = jax.jit(lambda k: jax.vmap(
    lambda v: weighted_histogram(v, 200.0, 1200.0, 50, v, chunk=16384))(
        200.0 + 1000.0 * jax.random.uniform(k, (W, 10, 200_000))))
steady_keyed("histogram x32 fresh (chunk 16k)", f_hist)

f_grid = jax.jit(lambda k: jax.vmap(lambda e: energy_weight_grid(
    spec, e))(mk_e0(k)))
steady_keyed("energy_weight_grid x32 fresh", f_grid)

theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
f_fwd = jax.jit(lambda k: jax.vmap(lambda kk: tof_spectrum(
    kk, theta, spec, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4))(jax.random.split(k, W)))
steady_keyed("tof_spectrum x32 fresh (1 run)", f_fwd)

# variant without the zero-degree segment stage
import dataclasses
spec_nz = dataclasses.replace(spec, zero_degree="none")
f_fwd2 = jax.jit(lambda k: jax.vmap(lambda kk: tof_spectrum(
    kk, theta, spec_nz, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4))(jax.random.split(k, W)))
steady_keyed("tof_spectrum x32 fresh (no zeroDeg)", f_fwd2)

# variant without rint
spec_nr = dataclasses.replace(spec, rint_draws=False)
f_fwd3 = jax.jit(lambda k: jax.vmap(lambda kk: tof_spectrum(
    kk, theta, spec_nr, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4))(jax.random.split(k, W)))
steady_keyed("tof_spectrum x32 fresh (no rint)", f_fwd3)
