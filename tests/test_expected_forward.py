"""sampling='expected': closed-form forward model (ops/e0grid.expected_moments).

The expected mode replaces the Monte-Carlo beam-sampling pipeline with
closed-form lognormal partial moments against the e0grid operator — the
exact infinite-draw limit of the reference's estimator
(``tests/simultFit.py:243-265``).  Validated here against the MC path
itself: averaging MC grids over many keys must converge to the expected
grid at the Monte-Carlo 1/sqrt(K N) rate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmctoffitting_tpu.models import onebd, simult
from mcmctoffitting_tpu.models.forward import (grid_and_mean,
                                               sample_beam_energies)
from mcmctoffitting_tpu.ops.e0grid import expected_moments, e0grid_moments_np


@pytest.mark.parametrize("preset", ["simult", "onebd"])
def test_expected_moments_match_mc_average(preset):
    n = 50_000
    n_keys = 24
    if preset == "simult":
        spec = simult.default_spec(n_samples=n, xs_mode="e0grid")
        params = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
        truncated = True   # n_redraw_rounds = -1 (exact truncation)
        assert spec.n_redraw_rounds != 0
    else:
        spec = onebd.default_spec(n_samples=n, xs_mode="e0grid")
        params = jnp.asarray([2490.0, 1300.0, 80.0, 0.6], jnp.float32)
        truncated = False  # oneBD disabled the redraw loop
        assert spec.n_redraw_rounds == 0
    tab = spec.e0_grid_table

    exp_m, exp_mean = expected_moments(tab, params[0], params[1], params[2],
                                       params[3], n, truncated)
    exp_m = np.asarray(exp_m, np.float64)

    acc = np.zeros_like(exp_m)
    means = []
    for i in range(n_keys):
        e0 = np.asarray(sample_beam_energies(
            jax.random.PRNGKey(100 + i), spec, params), np.float64)
        acc += e0grid_moments_np(tab, e0)
        means.append(e0.mean())
    acc /= n_keys

    # S0 is a count ~ N p_cell: tolerance a few sigma of the K-key MC mean
    occupied = exp_m[0] > 50.0
    assert occupied.sum() > 20
    sigma0 = np.sqrt(exp_m[0][occupied] / n_keys)
    z0 = (acc[0][occupied] - exp_m[0][occupied]) / sigma0
    assert np.abs(z0).max() < 5.0, f"worst cell z = {np.abs(z0).max():.2f}"
    # aggregate mass agrees tightly
    assert np.isclose(acc[0].sum(), exp_m[0].sum(),
                      rtol=4.0 / np.sqrt(n_keys * n))
    # higher moments track within MC error (looser: per-cell t-variance)
    for k in (1, 2, 3):
        d = np.abs(acc[k][occupied] - exp_m[k][occupied])
        assert (d / np.maximum(sigma0, 1e-9)).max() < 6.0

    # closed-form draw mean vs sample mean
    assert np.isclose(float(exp_mean), np.mean(means),
                      atol=5.0 * np.std(means) / np.sqrt(n_keys) + 1e-3)


def test_expected_grid_matches_mc_average_spectrum():
    """Full spectra: expected mode == mean of MC spectra (rint off to keep
    the comparison unbiased: rint is nonlinear, applied in both modes)."""
    import dataclasses

    n = 100_000
    spec_mc = dataclasses.replace(
        simult.default_spec(n_samples=n, xs_mode="e0grid"), rint_draws=False)
    spec_exp = dataclasses.replace(spec_mc, sampling="expected")
    prob = simult.SimultFitProblem(spec_mc, n_runs=1)
    params = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
    standoff, window = prob.standoffs[0], prob.windows[0]

    from mcmctoffitting_tpu.models.forward import tof_spectrum
    s_exp = np.asarray(tof_spectrum(jax.random.PRNGKey(0), params, spec_exp,
                                    standoff, window, get_pdf=True,
                                    scale=5.0e4))
    f = jax.jit(lambda k: tof_spectrum(k, params, spec_mc, standoff, window,
                                       get_pdf=True, scale=5.0e4))
    acc = np.zeros_like(s_exp)
    n_keys = 16
    for i in range(n_keys):
        acc += np.asarray(f(jax.random.PRNGKey(500 + i)))
    acc /= n_keys
    # MC noise of the averaged spectrum ~ peak/sqrt(K N_eff); demand the
    # deterministic spectrum sit inside a small multiple of that
    assert np.abs(acc - s_exp).max() < 0.01 * s_exp.max()


def test_expected_logp_is_deterministic():
    spec = onebd.default_spec(n_samples=200_000, sampling="expected")
    import dataclasses
    spec = dataclasses.replace(spec, bg_mode="expected")
    prob = onebd.OneBDProblem(spec, n_runs=2)
    rng = np.random.default_rng(0)
    observed = tuple(rng.poisson(200.0, w.n_bins).astype(np.float64)
                     for w in prob.windows)
    logp = prob.make_log_prob_fn(observed)
    theta = jnp.asarray([1300.0, 80.0, 0.6, 5e4, 5e4, 20.0, 20.0],
                        jnp.float32)
    l1 = logp(theta, jax.random.PRNGKey(1))
    l2 = logp(theta, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)


def test_expected_mode_guards():
    import dataclasses
    spec = simult.default_spec(n_samples=1000, xs_mode="taylor")
    bad = dataclasses.replace(spec, sampling="expected")
    with pytest.raises(ValueError, match="e0grid"):
        grid_and_mean(bad, jnp.zeros(4), jax.random.PRNGKey(0))


def test_expected_e0_mean_matches_sample_mean():
    """Closed-form draw mean vs big-sample mean, truncated + plain."""
    from mcmctoffitting_tpu.ops.e0grid import expected_e0_mean

    n = 400_000
    # truncated (simult-style: beamE - truncated lognorm)
    beam_e, e_loss, scale, s = 1878.4, 850.0, 170.0, 0.5
    spec = simult.default_spec(n_samples=n)
    params = jnp.asarray([beam_e, e_loss, scale, s], jnp.float32)
    draws = sample_beam_energies(jax.random.PRNGKey(0), spec, params)
    m_exp = float(expected_e0_mean(beam_e, e_loss, scale, s, True))
    m_smp = float(jnp.mean(draws))
    assert abs(m_exp - m_smp) < 5.0 * float(jnp.std(draws)) / np.sqrt(n)

    # untruncated (oneBD disabled the redraw loop)
    spec_u = onebd.default_spec(n_samples=n)
    params_u = jnp.asarray([2490.0, 1300.0, 80.0, 0.6], jnp.float32)
    draws_u = sample_beam_energies(jax.random.PRNGKey(1), spec_u, params_u)
    m_exp_u = float(expected_e0_mean(2490.0, 1300.0, 80.0, 0.6, False))
    m_smp_u = float(jnp.mean(draws_u))
    assert abs(m_exp_u - m_smp_u) < 5.0 * float(jnp.std(draws_u)) / np.sqrt(n)


def test_e0_mean_mode_expected_runs():
    """MC grid + expected lattice mean: spectra stay close to the
    faithful path (the mean moves by O(spread/sqrt(N)))."""
    import dataclasses

    from mcmctoffitting_tpu.models.forward import tof_spectrum

    n = 100_000
    spec_s = simult.default_spec(n_samples=n)
    spec_e = dataclasses.replace(spec_s, e0_mean_mode="expected")
    prob = simult.SimultFitProblem(spec_s, n_runs=1)
    params = jnp.asarray([1878.4, 850.0, 170.0, 0.5], jnp.float32)
    key = jax.random.PRNGKey(5)
    sa = np.asarray(tof_spectrum(key, params, spec_s, prob.standoffs[0],
                                 prob.windows[0], get_pdf=True, scale=5e4))
    sb = np.asarray(tof_spectrum(key, params, spec_e, prob.standoffs[0],
                                 prob.windows[0], get_pdf=True, scale=5e4))
    assert np.isfinite(sb).all()
    # same draws, lattice shifted by <~0.5 keV worth of mean jitter
    assert np.abs(sa - sb).sum() < 0.05 * sa.sum()
