"""Stage split of the e0grid MC forward on TPU: where does time go now?

Measures, batched over W walkers for one simult/oneBD run at 200k draws:
  draw       — truncated/plain lognormal beam sampling alone
  moments    — draw + fine-grid moment one-hot accumulation
  grid       — draw + moments + static A contraction (+ attenuation)
  spectrum   — full tof_spectrum (adds TOF lattice/histogram/convs)

Usage: python tools/tpu_e0grid_stages.py [--onebd] [--walkers W]
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

from mcmctoffitting_tpu.models import onebd, simult
from mcmctoffitting_tpu.models.forward import (_e0grid_weight_grid,
                                               energy_weight_grid,
                                               sample_beam_energies,
                                               tof_spectrum)

W = int(sys.argv[sys.argv.index("--walkers") + 1]) \
    if "--walkers" in sys.argv else 32

if "--onebd" in sys.argv:
    spec = onebd.default_spec(n_samples=200_000, xs_mode="e0grid")
    problem = onebd.OneBDProblem(spec, n_runs=3)
    theta = jnp.asarray([2490.0, 1300.0, 80.0, 0.6], jnp.float32)
    label = "onebd"
else:
    spec = simult.default_spec(n_samples=200_000, xs_mode="e0grid")
    problem = simult.SimultFitProblem(spec, n_runs=4)
    theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
    label = "simult"

key = jax.random.PRNGKey(0)


def steady(name, fn, iters=5):
    out = fn(jax.random.fold_in(key, 999), theta)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(key, i), theta)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label} {name} x{W}: {dt:.1f} ms", flush=True)
    return dt


def batched(per_key):
    # params MUST be a traced argument, not a closure constant: XLA expands
    # ndtri to its slow polynomial form when the truncation cdf is a
    # literal (measured 30 ms vs 0.5 ms for the same 6.4M-draw program);
    # traced params match production, where theta comes from walker state
    return jax.jit(lambda k, p: jax.vmap(
        lambda kk: per_key(kk, p))(jax.random.split(k, W)))


t_draw = steady("draw", batched(
    lambda k, p: jnp.sum(sample_beam_energies(k, spec, p))))
t_mom = steady("draw+moments", batched(
    lambda k, p: jnp.sum(_e0grid_weight_grid(
        spec, sample_beam_energies(k, spec, p)))))
t_grid = steady("draw+grid(+atten)", batched(
    lambda k, p: jnp.sum(energy_weight_grid(
        spec, sample_beam_energies(k, spec, p)))))
t_full = steady("tof_spectrum", batched(
    lambda k, p: jnp.sum(tof_spectrum(k, p, spec, problem.standoffs[0],
                                      problem.windows[0], get_pdf=True,
                                      scale=5e4))))
print(f"{label} split: draw {t_draw:.1f} | moments {t_mom - t_draw:.1f} | "
      f"contract {t_grid - t_mom:.1f} | tof-stage {t_full - t_grid:.1f} ms")
