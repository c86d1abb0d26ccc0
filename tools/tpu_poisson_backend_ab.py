"""Posterior-level A/B of the Poisson backend dispatch: Pallas vs XLA.

The counts-mode hot stage routes through ops/poisson.poisson_auto — the
fused Pallas kernel on TPU, the XLA PTRS sampler elsewhere.  The two
backends sample the exact same Poisson distribution on DIFFERENT random
streams (hardware PRNG vs threefry), so chains are backend-reproducible
but not cross-backend-identical.  This study pins the posterior-level
contract on real hardware: identical observed data, seeds and chain
config, the ONLY difference MCMCTOF_POISSON=pallas|xla; report the same
dz table the reference-parity studies use (dz = difference of medians
over the pooled sigma).  |dz| << 1 = same posterior.

The env var is read at TRACE time, so each arm sets it before building
its own jitted program (fresh closures force a fresh trace).

Chain config mirrors tools/counts_f_posterior_ab.py (64 walkers,
300 burn-in + 900 main, 50k draws, corrected likelihood), INCLUDING its
oneBD bg_mode='expected': the faithful per-bin Poisson background draw
collapses stretch-move acceptance to ~0.01 regardless of backend
(RESULTS_r3 "the oneBD background draw is its own noise source"), and a
frozen chain cannot measure a posterior — a first run with the faithful
bg produced acc 0.01/0.01 and unconverged medians on BOTH arms.  The
background dispatch site itself (models/forward._add_background) shares
the distribution validation of tools/tpu_poisson_validate.py.

Usage (TPU): python tools/tpu_poisson_backend_ab.py [--onebd]
Writes artifacts/poisson_backend_ab_{simult,onebd}.json.
"""
import dataclasses
import json
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

from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc
from mcmctoffitting_tpu.utils import data_io

assert jax.default_backend() == "tpu", "backend A/B needs the TPU"

N_WALKERS = 64
N_BURNIN = 300
N_MAIN = 900
N_DRAWS = 50_000


def main():
    onebd_mode = "--onebd" in sys.argv
    if onebd_mode:
        from mcmctoffitting_tpu.models import onebd as m
        base = m.default_spec(n_samples=N_DRAWS, sampling="counts")
        base = dataclasses.replace(base, bg_mode="expected")
        problem = m.OneBDProblem(base, n_runs=1, likelihood="poisson")
        truth = np.array([1300.0, 80.0, 0.6, 5e4, 20.0])
        names = ["eLoss", "scale", "s", "N1", "BG1"]
        tag = "onebd"
    else:
        from mcmctoffitting_tpu.models import simult as m
        base = m.default_spec(n_samples=N_DRAWS, sampling="counts")
        problem = m.SimultFitProblem(base, n_runs=2, likelihood="poisson")
        truth = np.concatenate([m.GUESS_SHARED, np.full(2, 5.0e4)])
        names = ["beamE", "eLoss", "scale", "s", "N1", "N2"]
        tag = "simult"

    key = jax.random.PRNGKey(0)
    observed = data_io.synthesize_observed(jax.random.fold_in(key, 99),
                                           problem, truth)
    p0 = problem.initial_walkers_from_observed(
        jax.random.fold_in(key, 1), N_WALKERS, observed)

    def run_backend(backend):
        os.environ["MCMCTOF_POISSON"] = backend
        # fresh closures -> fresh trace -> the dispatch re-reads the env
        lb = make_logp_batch(problem.make_log_prob_fn(observed))
        state = init_state(jax.random.fold_in(key, 2), jnp.asarray(p0), lb)
        seg = jax.jit(lambda s, n: run_mcmc(s, n, lb), static_argnums=1)
        t0 = time.time()
        state = seg(state, N_BURNIN).state
        chain = seg(state, N_MAIN)
        jax.block_until_ready(chain.positions)
        flat = np.asarray(chain.positions).reshape(-1, len(names))
        acc = float(np.sum(np.asarray(chain.n_accepted))) / (
            N_MAIN * N_WALKERS)
        print(f"{backend:>6}: {N_BURNIN}+{N_MAIN} steps in "
              f"{time.time()-t0:.0f}s, acc {acc:.2f}", flush=True)
        return flat, acc

    try:
        flat_p, acc_p = run_backend("pallas")
        flat_x, acc_x = run_backend("xla")
    finally:
        os.environ.pop("MCMCTOF_POISSON", None)

    rows, worst = [], 0.0
    print(f"{'param':>8} {'pallas med':>14} {'xla med':>14} {'dz':>7}")
    for d, name in enumerate(names):
        mp_, mx = np.median(flat_p[:, d]), np.median(flat_x[:, d])
        sig = np.sqrt(0.5 * (flat_p[:, d].std() ** 2
                             + flat_x[:, d].std() ** 2))
        dz = float((mp_ - mx) / sig) if sig > 0 else 0.0
        worst = max(worst, abs(dz))
        rows.append({"param": name, "med_pallas": float(mp_),
                     "med_xla": float(mx), "sigma": float(sig),
                     "dz": float(dz)})
        print(f"{name:>8} {mp_:12.4g} {mx:12.4g} {dz:7.2f}")
    verdict = "PASS" if worst < 1.0 else "FAIL"
    print(f"worst |dz| = {worst:.2f} -> {verdict}")
    out = os.path.join("/root/repo", "artifacts",
                       f"poisson_backend_ab_{tag}.json")
    with open(out, "w") as fj:
        json.dump({"backend": str(jax.devices()[0]),
                   "config": {"walkers": N_WALKERS, "burnin": N_BURNIN,
                              "main": N_MAIN, "draws": N_DRAWS},
                   "acc": {"pallas": acc_p, "xla": acc_x}, "rows": rows,
                   "worst_abs_dz": worst, "verdict": verdict}, fj,
                  indent=1)
    print(f"written {out}")
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
