"""likelihood='poisson' option on the flagship problems.

The reference's "poor man's logpmf" (``tests/simultFit.py:389-409``) takes
``gammaln(int(model)+1)`` — the int() cast makes the log-likelihood a
SAWTOOTH in the model counts, and since the MC model-count noise spans
many integers, that sawtooth IS the dominant pseudo-marginal logp noise
(measured sigma ~ 7e4 at flagship scale, nearly draw-count-independent;
the correct continuous logpmf measures sigma ~ 2).  The 'poisson' option
swaps in the correct form; 'reference' stays the faithful default.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.models import onebd, simult
from mcmctoffitting_tpu.utils import data_io


def _noise(problem, observed, theta, n_keys=8):
    logp = problem.make_log_prob_fn(observed)
    th = jnp.asarray(theta, jnp.float32)
    vals = np.array([float(logp(th, jax.random.PRNGKey(i)))
                     for i in range(n_keys)])
    assert np.isfinite(vals).all()
    return vals.std()


def test_poisson_likelihood_kills_sawtooth_noise():
    n = 20_000
    spec = simult.default_spec(n_samples=n)
    truth = np.concatenate([simult.GUESS_SHARED, [5e4, 5e4]])
    prob_ref = simult.SimultFitProblem(spec, n_runs=2)
    observed = data_io.synthesize_observed(jax.random.PRNGKey(9), prob_ref,
                                           truth)
    prob_poi = dataclasses.replace(prob_ref, likelihood="poisson")

    s_ref = _noise(prob_ref, observed, truth)
    s_poi = _noise(prob_poi, observed, truth)
    # the sawtooth dominates by orders of magnitude
    assert s_poi < s_ref / 20.0, (s_ref, s_poi)


def test_poisson_likelihood_recovers_truth():
    """Short fit under the corrected likelihood still centers on truth."""
    from mcmctoffitting_tpu.sampler import init_state, make_logp_batch, \
        run_mcmc
    n = 20_000
    spec = simult.default_spec(n_samples=n)
    prob = simult.SimultFitProblem(spec, n_runs=2, likelihood="poisson")
    truth = np.concatenate([simult.GUESS_SHARED, [5e4, 5e4]])
    observed = data_io.synthesize_observed(jax.random.PRNGKey(9), prob,
                                           truth)
    lb = make_logp_batch(prob.make_log_prob_fn(observed))
    p0 = prob.initial_walkers_from_observed(jax.random.PRNGKey(1), 16,
                                            observed)
    st = init_state(jax.random.PRNGKey(2), p0, lb)
    ch = run_mcmc(st, 60, lb)
    # low-noise likelihood: acceptance must stay healthy, chains move
    acc = float(ch.acceptance_fraction.mean())
    assert acc > 0.1, acc
    flat = np.asarray(ch.positions[30:]).reshape(-1, 6)
    med = np.median(flat, axis=0)
    assert abs(med[0] - 1878.4) < 25.0
    assert abs(med[1] - 850.0) < 60.0


def test_onebd_poisson_option_runs():
    spec = onebd.default_spec(n_samples=10_000)
    prob = onebd.OneBDProblem(spec, n_runs=2, likelihood="poisson")
    truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 20.0, 20.0])
    observed = data_io.synthesize_observed(jax.random.PRNGKey(3), prob,
                                           truth)
    logp = prob.make_log_prob_fn(observed)
    v = float(logp(jnp.asarray(truth, jnp.float32), jax.random.PRNGKey(0)))
    assert np.isfinite(v)
