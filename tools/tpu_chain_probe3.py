"""Counts-path stage split, floor- AND hoist-corrected (r4, take 3).

Two measurement artifacts poisoned earlier stage splits:
1. tunnel floor — at small CHAIN the ~30 ms per-call axon round trip
   reads as ms-scale fake stage time (tools/tpu_chain_probe.py);
2. broadcast hoisting — feeding every vmap lane the SAME theta lets XLA
   sink the broadcast through the deterministic moment chain and compute
   it ONCE (expected-moments read 0.009 ms/iter at W=1024 in
   tools/tpu_chain_probe2.py — production computes it per walker).

This probe uses CHAIN=256 and per-walker jittered theta, which is what
the sampler actually evaluates.  Also sweeps W on the joint logp to
locate the true saturation behavior.

Usage: python tools/tpu_chain_probe3.py [--chain N] [--walkers W]
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
print(f"simult counts: W={W} F={spec.e0_grid_fine} CHAIN={CHAIN} "
      f"(per-walker theta)", flush=True)


def chained(per_key, params=theta, w=W):
    d = int(np.asarray(params).shape[0])
    # distinct theta per walker (relative jitter ~1e-4): defeats XLA's
    # broadcast sinking, matching the real ensemble where every walker
    # carries its own position
    jit_rel = 1e-4 * jax.random.normal(jax.random.PRNGKey(42), (w, d))

    def run(k, p):
        def body(carry, i):
            th = p[None, :] * (1.0 + jit_rel + carry * 1e-20)   # (w, d)
            ks = jax.random.split(jax.random.fold_in(k, i), w)
            out = jax.vmap(per_key)(ks, th)
            return jnp.sum(out * out) ** 0.5 * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(CHAIN))
        return c
    return jax.jit(run).lower(key, params).compile()


def steady(name, compiled, params=theta, iters=2, w=W):
    float(compiled(jax.random.fold_in(key, 999), params))  # warm
    t0 = time.perf_counter()
    for i in range(iters):
        float(compiled(jax.random.fold_in(key, i), params))
    dt = (time.perf_counter() - t0) / (iters * CHAIN) * 1000
    print(f"{name} x{w}: {dt:.3f} ms/iter "
          f"(-> {w / dt * 1000 / 4:.0f} eq-walker-steps/s at 4 runs)",
          flush=True)
    return dt


t_floor = steady("floor (sum theta)  ", chained(
    lambda k, p: jnp.sum(p) * 1e-20))
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

print(f"\nstage deltas (ms/iter): chain(exp) {t_exp - t_floor:.3f} | "
      f"poisson {t_cnt - t_exp:.3f} | A-dot {t_grid - t_cnt:.3f} | "
      f"tof {t_spec - t_grid:.3f} | 4runs-vs-1run {t_logp - t_spec:.3f}",
      flush=True)

for w in (128, 2048):
    comp = chained(lambda k, p: logp(p, k), theta_full, w=w)
    steady(f"joint logp W={w:5d}  ", comp, theta_full, w=w)

