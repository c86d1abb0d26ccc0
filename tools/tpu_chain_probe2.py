"""Counts-path stage split, floor-corrected (r4 ceiling work, take 2).

tools/tpu_chain_probe.py exposed a measurement floor: at CHAIN=16 the
per-call axon-tunnel round trip (~30 ms) reads as ~1.9 ms/iter on ANY
program (a bare elementwise multiply measured 1.945 ms/iter — "stage
times" at or below that are floor, not device work).  This probe re-runs
the stage split with CHAIN dependent iterations large enough to bury the
floor (CHAIN=256 -> floor contribution ~0.12 ms/iter), plus the floor
probe itself for the record.

Usage: python tools/tpu_chain_probe2.py [--chain N] [--walkers W]
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
from mcmctoffitting_tpu.models.forward import grid_and_mean, tof_spectrum
from mcmctoffitting_tpu.ops.e0grid import expected_moments, \
    poissonized_moments
from mcmctoffitting_tpu.utils import data_io


def _arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


CHAIN = _arg("--chain", 256)
W = _arg("--walkers", 1024)

spec = simult.default_spec(n_samples=200_000, sampling="counts")
problem = simult.SimultFitProblem(spec, n_runs=4, likelihood="poisson")
tab = spec.e0_grid_table
truncated = spec.n_redraw_rounds != 0
key = jax.random.PRNGKey(0)
theta = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
truth = np.concatenate([[1878.4, 850.0, 170.0, 0.5], [5e4] * 4])
print(f"simult counts: W={W} F={spec.e0_grid_fine} CHAIN={CHAIN}",
      flush=True)


def chained(per_key, params=theta):
    def run(k, p):
        def body(carry, i):
            out = jax.vmap(lambda kk: per_key(kk, p + carry * 1e-20))(
                jax.random.split(jax.random.fold_in(k, i), W))
            return jnp.sum(out * out) ** 0.5 * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    return jax.jit(run).lower(key, params).compile()


def steady(name, compiled, params=theta, iters=2):
    float(compiled(jax.random.fold_in(key, 999), params))  # warm
    t0 = time.perf_counter()
    for i in range(iters):
        float(compiled(jax.random.fold_in(key, i), params))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{name} x{W}: {dt:.3f} ms/iter", flush=True)
    return dt


# measurement floor: bare elementwise op on a walker-sized tensor
t_floor = steady("floor (v*1.0001)   ", chained(
    lambda k, p: jnp.sum(p * 1.0001)))
t_exp = steady("expected-moments   ", chained(
    lambda k, p: jnp.sum(expected_moments(
        tab, p[0], p[1], p[2], p[3], float(spec.n_samples), truncated)[0])))
t_cnt = steady("counts-moments     ", chained(
    lambda k, p: jnp.sum(poissonized_moments(
        k, tab, p[0], p[1], p[2], p[3], float(spec.n_samples),
        truncated)[0])))
t_grid = steady("counts grid        ", chained(
    lambda k, p: jnp.sum(grid_and_mean(spec, p, k)[0])))
t_spec = steady("tof_spectrum (1run)", chained(
    lambda k, p: jnp.sum(tof_spectrum(
        k, p, spec, problem.standoffs[0], problem.windows[0],
        get_pdf=True, scale=5e4))))

observed = data_io.synthesize_observed(jax.random.fold_in(key, 9), problem,
                                       truth)
logp = problem.make_log_prob_fn(observed)
theta_full = jnp.asarray(truth, jnp.float32)
t_logp = steady("joint logp (4 runs)", chained(
    lambda k, p: logp(p, k), theta_full), params=theta_full)

print(f"\nfloor-corrected stages (ms/iter above floor {t_floor:.3f}):",
      flush=True)
for name, t in (("expected", t_exp), ("counts", t_cnt), ("grid", t_grid),
                ("spectrum-1run", t_spec), ("joint-4runs", t_logp)):
    print(f"  {name:14s} {max(t - t_floor, 0.0):.3f}", flush=True)
print(f"deltas: poisson {t_cnt - t_exp:.3f} | A-dot {t_grid - t_cnt:.3f} "
      f"| tof {t_spec - t_grid:.3f} | "
      f"4runs-vs-1run {t_logp - t_spec:.3f}", flush=True)
