"""oneBD walker-steps/s benchmark on TPU (default / quickish / hardcore).

Same methodology as bench.py (warm-up segment, best-of-2 measurement) but
for the csi_oneBD flagship: 256 walkers x 9 params, 3 runs, per-run Poisson
background, spline-table stopping.  Presets mirror the reference
(``tests/csi_oneBD.py:63-71,199-205``): default 200k draws / 100x10 bins,
--quickish 100k, --qnd 60k, --hardcore 200k draws / 400x20 bins.

Usage: python tools/tpu_onebd_bench.py [--quickish|--qnd|--hardcore]
       [--steps N] [--walkers W]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mcmctoffitting_tpu.models import onebd
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc
from mcmctoffitting_tpu.utils import data_io


def _arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    hardcore = "--hardcore" in sys.argv
    n_draws = 200_000
    label = "default"
    if "--quickish" in sys.argv:
        n_draws, label = 100_000, "quickish"
    if "--qnd" in sys.argv:
        n_draws, label = 60_000, "qnd"
    if hardcore:
        label = "hardcore"
    n_walkers = _arg("--walkers", 256)
    n_steps = _arg("--steps", 5 if hardcore else 10)
    xs_mode = "taylor" if "--taylor" in sys.argv else "e0grid"
    if xs_mode == "taylor":
        label += "+taylor"
    sampling = _arg("--sampling", "mc", str)
    if sampling != "mc":
        label += f"+{sampling}"
    closure = _arg("--closure", "exact", str)
    if closure != "exact":
        label += f"+{closure}"
    tof_radix = _arg("--tof-radix", 0)
    if tof_radix:
        label += f"+radix{tof_radix}"
    run_axis = _arg("--run-axis", "", str)
    if run_axis:
        label += f"+{run_axis}"
    a_dtype = _arg("--a-dtype", "float32", str)
    if a_dtype != "float32":
        label += f"+a{a_dtype}"

    spec = onebd.default_spec(n_samples=n_draws, hardcore=hardcore,
                              xs_mode=xs_mode, sampling=sampling)
    if closure != "exact" or tof_radix or run_axis or a_dtype != "float32":
        import dataclasses
        spec = dataclasses.replace(
            spec, moment_closure=closure,
            tof_hist_radix=tof_radix or spec.tof_hist_radix,
            run_axis=run_axis or spec.run_axis,
            a_dtype=a_dtype)
    if "--fine" in sys.argv or "--hchunk" in sys.argv:
        import dataclasses
        from mcmctoffitting_tpu.ops.e0grid import cached_e0_grid_table
        from mcmctoffitting_tpu.ops.xs import ddn_xs_uniform
        fine = _arg("--fine", spec.e0_grid_fine)
        hchunk = _arg("--hchunk", spec.histogram_chunk)
        tab = spec.e0_grid_table
        if xs_mode == "e0grid" and fine != spec.e0_grid_fine:
            tab = cached_e0_grid_table(spec.stopping_table, spec.ed_binning,
                                       ddn_xs_uniform, fine)
        spec = dataclasses.replace(spec, e0_grid_fine=fine,
                                   e0_grid_table=tab,
                                   histogram_chunk=hchunk)
        label += f"(F={fine},hc={hchunk})"
    problem = onebd.OneBDProblem(spec, n_runs=3)
    key = jax.random.PRNGKey(0)
    truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 5e4, 20.0, 20.0, 20.0])
    observed = data_io.synthesize_observed(jax.random.fold_in(key, 9),
                                           problem, truth)
    # per-mode chunk default as in bench.py: the per-sample mc path needs
    # the memory cap; counts/expected per-walker state is O(F) and vmaps
    # the full half-ensemble (--chunk 0 = unchunked explicitly)
    chunk = _arg("--chunk", 32 if sampling == "mc" else 0) or None
    logp_batch = make_logp_batch(problem.make_log_prob_fn(observed),
                                 chunk=chunk)
    p0 = problem.initial_walkers_from_observed(
        jax.random.fold_in(key, 1), n_walkers, observed)

    print(f"onebd bench[{label}]: {n_walkers} walkers, {n_draws} draws, "
          f"{spec.ed_binning.n}x{spec.x_binning.n} bins, "
          f"{n_steps}-step segments", file=sys.stderr, flush=True)
    state = init_state(jax.random.fold_in(key, 2), p0, logp_batch)
    jax.block_until_ready(state.log_probs)

    # jit + explicitly compile the whole segment: an eager lax.scan
    # re-traces its body on every call, which understated all round-1/2
    # eager-mode numbers by up to ~2x of host tracing time
    def segment(s):
        chain = run_mcmc(s, n_steps, logp_batch)
        return chain.positions, chain.state

    t0 = time.perf_counter()
    compiled = jax.jit(segment).lower(state).compile()
    positions, state = compiled(state)
    jax.block_until_ready(positions)
    print(f"warm-up (incl. compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    best_dt = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        positions, state = compiled(state)
        jax.block_until_ready(positions)
        dt = time.perf_counter() - t0
        print(f"segment {rep}: {n_steps} steps in {dt:.2f}s",
              file=sys.stderr, flush=True)
        best_dt = min(best_dt, dt)
    rate = n_steps * n_walkers / best_dt
    print(json.dumps({
        "metric": f"csi_oneBD_walker_steps_per_sec_{label}",
        "value": round(rate, 3),
        "unit": f"walker-steps/s ({n_walkers} walkers, 3 runs, "
                f"{n_draws} draws, {spec.ed_binning.n}x{spec.x_binning.n})",
    }))


if __name__ == "__main__":
    main()
