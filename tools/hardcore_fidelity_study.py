"""Posterior-level fine-grid (F) fidelity study for -hardcore (VERDICT r2
item 8).

Round 2 chose the hardcore e0grid fine-grid F=1024 from a PER-CELL error
sweep (mis-assignment <= 25% of per-bin MC noise).  This pins the choice at
the POSTERIOR level: run the corrected-likelihood (-likelihood poisson)
hardcore fit at F in {512, 1024, 2048} on identical observed data and
identical PRNG seeds, and measure how much the posterior medians and
widths move between F settings, in units of the F=1024 posterior sigma.
Acceptance bar (VERDICT): < 0.1 sigma.

Usage: python tools/hardcore_fidelity_study.py [--steps N] [--walkers W]
Writes out/hardcore_f_study.json and prints the table.
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

import dataclasses

from mcmctoffitting_tpu.models import onebd
from mcmctoffitting_tpu.ops.e0grid import cached_e0_grid_table
from mcmctoffitting_tpu.ops.xs import ddn_xs_uniform
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc
from mcmctoffitting_tpu.utils import data_io


def _arg(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) \
        if name in sys.argv else default


def main():
    n_walkers = _arg("--walkers", 256)
    n_burn = _arg("--burn", 150)
    n_main = _arg("--steps", 150)
    fs = (512, 1024, 2048)
    # --expected: deterministic forward + deterministic bg — the SHARP
    # instrument.  The mc run's same-F/different-seed control showed the
    # pseudo-marginal seed scatter (1.48 sigma) exceeds any F effect, so
    # the F comparison needs the noise-free estimator: any posterior
    # movement under --expected is purely the fine-grid operator error.
    expected = "--expected" in sys.argv

    base = onebd.default_spec(n_samples=200_000, hardcore=True)
    if expected:
        base = dataclasses.replace(base, sampling="expected",
                                   bg_mode="expected")
    problem0 = onebd.OneBDProblem(base, n_runs=3, likelihood="poisson")
    truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 5e4, 20.0, 20.0, 20.0])
    key = jax.random.PRNGKey(0)
    observed = data_io.synthesize_observed(jax.random.fold_in(key, 99),
                                           problem0, truth)
    names = (["eLoss", "scale", "s"] + [f"N{i+1}" for i in range(3)]
             + [f"BG{i+1}" for i in range(3)])

    results = {}
    for f in fs:
        tab = cached_e0_grid_table(base.stopping_table, base.ed_binning,
                                   ddn_xs_uniform, f)
        spec = dataclasses.replace(base, e0_grid_fine=f, e0_grid_table=tab)
        problem = onebd.OneBDProblem(spec, n_runs=3, likelihood="poisson")
        logp_batch = make_logp_batch(problem.make_log_prob_fn(observed),
                                     chunk=32)
        p0 = problem.initial_walkers_from_observed(
            jax.random.fold_in(key, 1), n_walkers, observed)
        t0 = time.time()
        state = init_state(jax.random.fold_in(key, 2), p0, logp_batch)

        # Chain is a plain dataclass (not a pytree): jit pytree outputs only
        def segment(s, n):
            ch = run_mcmc(s, n, logp_batch)
            return ch.positions, ch.n_accepted, ch.state

        seg = jax.jit(segment, static_argnums=1)
        _, _, state = seg(state, n_burn)
        positions, n_acc, state = seg(state, n_main)
        flat = np.asarray(positions).reshape(-1, 9)
        q = np.percentile(flat, [16, 50, 84], axis=0)
        results[f] = {"med": q[1].tolist(),
                      "sig": (0.5 * (q[2] - q[0])).tolist(),
                      "acc": float(np.sum(np.asarray(n_acc))
                                   / (n_main * n_walkers)),
                      "elapsed_s": time.time() - t0}
        print(f"F={f}: {time.time()-t0:.0f}s acc="
              f"{results[f]['acc']:.2f}", flush=True)

    ref_sig = np.asarray(results[1024]["sig"])
    lines = [f"{'param':>6} " + " ".join(f"{f:>10}" for f in fs)
             + "   dmed(512)/sig  dmed(2048)/sig  dsig(512)  dsig(2048)"]
    worst_med, worst_sig = 0.0, 0.0
    for d, name in enumerate(names):
        meds = [results[f]["med"][d] for f in fs]
        sigs = [results[f]["sig"][d] for f in fs]
        dm512 = abs(meds[0] - meds[1]) / ref_sig[d]
        dm2048 = abs(meds[2] - meds[1]) / ref_sig[d]
        ds512 = abs(sigs[0] - sigs[1]) / ref_sig[d]
        ds2048 = abs(sigs[2] - sigs[1]) / ref_sig[d]
        worst_med = max(worst_med, dm512, dm2048)
        worst_sig = max(worst_sig, ds512, ds2048)
        lines.append(f"{name:>6} " + " ".join(f"{m:10.4g}" for m in meds)
                     + f"   {dm512:12.3f}  {dm2048:13.3f}  {ds512:9.3f}"
                     f"  {ds2048:10.3f}")
    lines.append(f"worst |dmedian|/sigma = {worst_med:.3f}, "
                 f"worst |dsigma|/sigma = {worst_sig:.3f} "
                 "(bar: < 0.1 would fully pin F; the ensemble's own "
                 "seed-to-seed scatter sets the floor — see the "
                 "same-F/different-seed control row in the JSON)")
    print("\n".join(lines))

    # control: same F=1024, different sampler seed — the statistical floor
    tab = cached_e0_grid_table(base.stopping_table, base.ed_binning,
                               ddn_xs_uniform, 1024)
    spec = dataclasses.replace(base, e0_grid_fine=1024, e0_grid_table=tab)
    problem = onebd.OneBDProblem(spec, n_runs=3, likelihood="poisson")
    logp_batch = make_logp_batch(problem.make_log_prob_fn(observed),
                                 chunk=32)
    p0 = problem.initial_walkers_from_observed(
        jax.random.fold_in(key, 11), n_walkers, observed)
    state = init_state(jax.random.fold_in(key, 12), p0, logp_batch)

    def segment(s, n):
        ch = run_mcmc(s, n, logp_batch)
        return ch.positions, ch.n_accepted, ch.state

    seg = jax.jit(segment, static_argnums=1)
    _, _, state = seg(state, n_burn)
    positions, _, state = seg(state, n_main)
    flat = np.asarray(positions).reshape(-1, 9)
    q = np.percentile(flat, [16, 50, 84], axis=0)
    ctrl_dm = np.abs(q[1] - np.asarray(results[1024]["med"])) / ref_sig
    print(f"control (same F=1024, new seed): worst |dmedian|/sigma = "
          f"{ctrl_dm.max():.3f}")

    os.makedirs("out", exist_ok=True)
    out_name = ("out/hardcore_f_study_expected.json" if expected
                else "out/hardcore_f_study.json")
    with open(out_name, "w") as fjson:
        json.dump({"results": {str(k): v for k, v in results.items()},
                   "names": names,
                   "worst_dmed_sigma": worst_med,
                   "worst_dsig_sigma": worst_sig,
                   "control_worst_dmed_sigma": float(ctrl_dm.max()),
                   "config": {"walkers": n_walkers, "burn": n_burn,
                              "main": n_main,
                              "sampling": base.sampling}}, fjson, indent=1)
    print(f"written {out_name}")


if __name__ == "__main__":
    main()
