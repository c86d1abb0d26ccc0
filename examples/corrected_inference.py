"""Recommended production inference, end to end, in about a minute.

The faithful defaults reproduce the reference's behavior exactly —
including its statistical defects (RESULTS_r2.md: the int()-cast
likelihood sawtooth dominates the pseudo-marginal noise AND fabricates
false precision on degenerate directions).  This example runs the
recommended CORRECTED configuration on the simultFit flagship:

* ``sampling='expected'`` — closed-form infinite-draw forward (no
  pseudo-marginal noise, ~50x faster than MC);
* ``likelihood='poisson'`` — correct Poisson logpmf (no sawtooth);

and prints the honest posterior: the beamE-eLoss degeneracy ridge is
wide, their difference (the mean on-target beam energy) is tight.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=. python examples/corrected_inference.py
(or on TPU by dropping JAX_PLATFORMS; equivalent CLI:
 ``python -m mcmctoffitting_tpu.cli.simult_fit -expectedForward
   -likelihood poisson``)
"""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, run_mcmc
from mcmctoffitting_tpu.utils import data_io


def main():
    n_runs = 2
    spec = simult.default_spec(n_samples=200_000, sampling="expected")
    problem = simult.SimultFitProblem(spec, n_runs=n_runs,
                                      likelihood="poisson")

    # synthetic observed data at the reference's guess parameters
    truth = np.concatenate([simult.GUESS_SHARED, np.full(n_runs, 5.0e4)])
    key = jax.random.PRNGKey(0)
    observed = data_io.synthesize_observed(jax.random.fold_in(key, 99),
                                           problem, truth)

    logp = problem.make_log_prob_fn(observed)
    logp_batch = make_logp_batch(logp)
    p0 = problem.initial_walkers_from_observed(
        jax.random.fold_in(key, 1), 64, observed)
    state = init_state(jax.random.fold_in(key, 2), p0, logp_batch)

    state = run_mcmc(state, 300, logp_batch).state          # burn-in
    chain = run_mcmc(state, 300, logp_batch)                # main
    print(f"acceptance: {float(chain.acceptance_fraction.mean()):.2f}")

    flat = np.asarray(chain.positions).reshape(-1, problem.n_dim)
    names = ["beamE", "eLoss", "scale", "s"] + [
        f"N{i + 1}" for i in range(n_runs)]
    q = np.percentile(flat, [16, 50, 84], axis=0)
    print("corrected posterior (median +sigma -sigma):")
    for d, name in enumerate(names):
        print(f"  {name:>6} = {q[1, d]:.4g} "
              f"+{q[2, d] - q[1, d]:.3g} -{q[1, d] - q[0, d]:.3g}")
    diff = flat[:, 0] - flat[:, 1]
    dq = np.percentile(diff, [16, 50, 84])
    print(f"  beamE - eLoss (the constrained combination) = "
          f"{dq[1]:.4g} +{dq[2] - dq[1]:.3g} -{dq[1] - dq[0]:.3g} "
          f"(truth {truth[0] - truth[1]:.4g})")


if __name__ == "__main__":
    main()
