"""End-to-end closure test: the minimum slice of SURVEY.md §7.2 step 6.

Mirrors ``tests/simpleTOFmodel.py:124-209``: generate fake TOF data at known
truth (E0=1100, E1=-100, sigma=50), run the full native pipeline — forward
model, multinomial likelihood, box prior, stretch-move ensemble — and
require the posterior to cover the truth.  Reduced walkers/steps/draws vs
the reference driver to stay CPU-test-sized; the CLI runs the full config.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.models.simple import (SimpleProblem, SimpleSpec,
                                              V0_TRUTH, V0_WINDOW,
                                              sample_tof)
from mcmctoffitting_tpu.sampler import sample


def test_simple_tof_closure():
    key = jax.random.PRNGKey(0)
    # the multinomial likelihood needs enough MC draws that no observed bin
    # sees a zero-model pdf (the reference uses 1e6, tests/simpleTOFmodel.py
    # :78); 200k keeps the -inf rate negligible and runs ~10 s on CPU
    spec = SimpleSpec(n_samples=200_000)
    problem = SimpleProblem(spec=spec)

    # fake data at truth (reference draws 10k samples and histograms)
    tofs, _, _, _ = sample_tof(jax.random.fold_in(key, 0),
                               jnp.asarray(V0_TRUTH), spec, problem.standoff)
    observed, _ = np.histogram(np.asarray(tofs)[:10_000], V0_WINDOW.n_bins,
                               V0_WINDOW.range)

    logp = problem.make_log_prob_fn(observed.astype(np.float64))

    # truth should beat a clearly wrong point (likelihood sanity scan,
    # SURVEY.md §4 item 4)
    lp_truth = float(logp(jnp.asarray(V0_TRUTH), jax.random.fold_in(key, 5)))
    lp_off = float(logp(jnp.asarray([1000.0, -150.0, 80.0]),
                        jax.random.fold_in(key, 6)))
    assert lp_truth > lp_off

    # full fit: 32 walkers, 150 steps (reference: 50 x 500)
    n_walkers, n_dim = 32, 3
    init = jnp.asarray([1100.0 * 1.01, -100.0 * 1.1, 50.0 * 0.8])
    p0 = init + 1e-2 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (n_walkers, n_dim))
    chain = sample(jax.random.fold_in(key, 2), p0, 150, logp,
                   stochastic=True)
    acc = float(np.asarray(chain.acceptance_fraction).mean())
    assert 0.1 < acc < 0.9, f"acceptance {acc} outside healthy band"

    samples = np.asarray(chain.positions[75:]).reshape(-1, n_dim)
    q16, q50, q84 = np.percentile(samples, [16, 50, 84], axis=0)
    truth = np.asarray(V0_TRUTH)

    # posterior must cover truth within ~2x the 68% interval
    half_width = np.maximum((q84 - q16) / 2, [2.0, 2.0, 1.0])
    assert np.all(np.abs(q50 - truth) < 4 * half_width), (
        f"median {q50} too far from truth {truth} (width {half_width})")
    # and be meaningfully concentrated (not prior-wide)
    assert q84[0] - q16[0] < 150.0
    assert np.all(np.isfinite(np.asarray(chain.log_probs)))
