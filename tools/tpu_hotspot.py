"""Steady-state timing of each forward-model stage on the TPU."""
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
from mcmctoffitting_tpu.models.forward import (cell_tof_lattice,
                                               energy_weight_grid,
                                               tof_spectrum)
from mcmctoffitting_tpu.ops.histogram import weighted_histogram
from mcmctoffitting_tpu.ops.pdfs import beam_energy_rvs
from mcmctoffitting_tpu.ops.stopping import rk4_transport

key = jax.random.PRNGKey(0)
spec = simult.default_spec(n_samples=200_000)
problem = simult.SimultFitProblem(spec, n_runs=4)
W = 32  # walkers batched


def steady(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return out


e0 = jnp.broadcast_to(jnp.linspace(600.0, 1200.0, 200_000), (W, 200_000))

f_draw = jax.jit(jax.vmap(lambda k: beam_energy_rvs(
    k, 200_000, 1878.4, 850.0, 170.0, 0.5)))
keys = jax.random.split(key, W)
steady("beam_energy_rvs x32", f_draw, keys)

f_rk4 = jax.jit(jax.vmap(lambda e: rk4_transport(
    spec.stopping.dedx, e, spec.x_binning.centers)))
e_at_x = steady("rk4_transport x32", f_rk4, e0)

f_xs = jax.jit(jax.vmap(spec.xs))
w = steady("xs spline x32", f_xs, e_at_x)

f_hist = jax.jit(jax.vmap(lambda v, ww: weighted_histogram(
    v, 200.0, 1200.0, 50, ww, chunk=16384)))
steady("histogram x32 (chunk 16384)", f_hist, e_at_x, w)

f_hist2 = jax.jit(jax.vmap(lambda v, ww: weighted_histogram(
    v, 200.0, 1200.0, 50, ww, chunk=65536)))
steady("histogram x32 (chunk 65536)", f_hist2, e_at_x, w)

f_grid = jax.jit(jax.vmap(lambda e: energy_weight_grid(spec, e)))
steady("energy_weight_grid x32", f_grid, e0)

theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
f_fwd = jax.jit(jax.vmap(lambda k: tof_spectrum(
    k, theta, spec, problem.standoffs[0], problem.windows[0],
    get_pdf=True, scale=5e4)))
steady("tof_spectrum x32 (1 run)", f_fwd, keys)
