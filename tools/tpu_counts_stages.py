"""Stage split of the counts-mode forward on TPU: what bounds 33k w-s/s?

The counts estimator replaced the O(N*F) per-sample hot stage with O(F)
work (ops/e0grid.poissonized_moments); this probe pins where its time goes
now, batched over W walkers for ONE run at the flagship F:

  expected   — closed-form partial moments alone (the 'expected' path)
  counts     — + Poisson cell draws + overflow-cell e0 mean (the estimator)
  grid       — + static A contraction (+ attenuation for onebd)
  spectrum   — full tof_spectrum (adds TOF lattice/histogram/convs)
  logp       — the production joint likelihood (all runs + prior), i.e.
               what the sampler actually calls per walker

Timing rules (learned round 2, see tools/tpu_sorted_probe.py): chain
iterations inside one lax.scan with a data dependence and fetch the scalar
result to host — block_until_ready on the axon tunnel does not reliably
serialize.

Usage: python tools/tpu_counts_stages.py [--onebd] [--walkers W]
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
from mcmctoffitting_tpu.models.forward import grid_and_mean, tof_spectrum
from mcmctoffitting_tpu.ops.e0grid import (expected_moments,
                                           poissonized_moments)
from mcmctoffitting_tpu.utils import data_io

W = int(sys.argv[sys.argv.index("--walkers") + 1]) \
    if "--walkers" in sys.argv else 128
CHAIN = 16

if "--onebd" in sys.argv:
    spec = onebd.default_spec(n_samples=200_000, sampling="counts")
    problem = onebd.OneBDProblem(spec, n_runs=3)
    theta = jnp.asarray([2490.0, 1300.0, 80.0, 0.6], jnp.float32)
    truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 5e4, 20.0, 20.0, 20.0])
    label = "onebd"
else:
    spec = simult.default_spec(n_samples=200_000, sampling="counts")
    problem = simult.SimultFitProblem(spec, n_runs=4)
    theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
    truth = np.concatenate([[1878.4, 850.0, 170.0, 0.5],
                            [5e4] * problem.n_runs])
    label = "simult"

tab = spec.e0_grid_table
truncated = spec.n_redraw_rounds != 0
key = jax.random.PRNGKey(0)
print(f"{label}: W={W} F={spec.e0_grid_fine} runs={problem.n_runs} "
      f"truncated={truncated}", flush=True)


def chained(per_key, params=theta):
    """W-walker batch, CHAIN dependent iterations inside one jit."""
    def run(k, p):
        def body(carry, i):
            out = jax.vmap(lambda kk: per_key(kk, p + carry * 1e-20))(
                jax.random.split(jax.random.fold_in(k, i), W))
            return jnp.sum(out * out) ** 0.5 * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    return jax.jit(run).lower(key, params).compile()


def steady(name, compiled, params=theta, iters=3):
    float(compiled(jax.random.fold_in(key, 999), params))  # warm
    t0 = time.perf_counter()
    for i in range(iters):
        float(compiled(jax.random.fold_in(key, i), params))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{label} {name} x{W}: {dt:.2f} ms/iter", flush=True)
    return dt


t_exp = steady("expected-moments", chained(
    lambda k, p: jnp.sum(expected_moments(
        tab, p[0], p[1], p[2], p[3], float(spec.n_samples), truncated)[0])))
t_exp2 = steady("  closure='cell'", chained(
    lambda k, p: jnp.sum(expected_moments(
        tab, p[0], p[1], p[2], p[3], float(spec.n_samples), truncated,
        "cell")[0])))
t_cnt = steady("counts-moments  ", chained(
    lambda k, p: jnp.sum(poissonized_moments(
        k, tab, p[0], p[1], p[2], p[3], float(spec.n_samples),
        truncated)[0])))
t_grid = steady("counts grid     ", chained(
    lambda k, p: jnp.sum(grid_and_mean(spec, p, k)[0])))
t_spec = steady("tof_spectrum    ", chained(
    lambda k, p: jnp.sum(tof_spectrum(
        k, p, spec, problem.standoffs[0], problem.windows[0],
        get_pdf=True, scale=5e4))))

observed = data_io.synthesize_observed(jax.random.fold_in(key, 9), problem,
                                       truth)
logp = problem.make_log_prob_fn(observed)
theta_full = jnp.asarray(truth, jnp.float32)
t_logp = steady("joint logp      ", chained(
    lambda k, p: logp(p, k), theta_full), params=theta_full)

print(f"\nmoment-closure 'cell' vs 'exact': {t_exp2:.2f} vs {t_exp:.2f} ms "
      f"({t_exp / max(t_exp2, 1e-9):.2f}x on the chain stage)", flush=True)
print(f"per-iter deltas: poisson+overflow {t_cnt - t_exp:.2f} ms | "
      f"A-contraction {t_grid - t_cnt:.2f} ms | "
      f"tof stage {t_spec - t_grid:.2f} ms | "
      f"joint({problem.n_runs} runs+prior) vs 1-run spectrum "
      f"{t_logp - t_spec:.2f} ms", flush=True)
