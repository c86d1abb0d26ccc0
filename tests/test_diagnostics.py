"""Oracle tests for utils/diagnostics.py (pure numpy, no device work).

AR(1) chains have a closed-form integrated autocorrelation time
tau = (1 + phi) / (1 - phi); the estimator must recover it, read ~1 on
iid chains, and split R-hat must flag non-stationary drift.
"""
import numpy as np

from mcmctoffitting_tpu.utils.diagnostics import (chain_summary,
                                                  effective_sample_size,
                                                  format_summary,
                                                  integrated_autocorr_time,
                                                  split_rhat)


def _ar1_chain(rng, phi, s=4000, w=16, d=1):
    x = np.zeros((s, w, d))
    innov = rng.normal(size=(s, w, d)) * np.sqrt(1.0 - phi ** 2)
    for t in range(1, s):
        x[t] = phi * x[t - 1] + innov[t]
    return x


def test_ar1_tau_matches_closed_form():
    rng = np.random.default_rng(0)
    for phi in (0.5, 0.9):
        chain = _ar1_chain(rng, phi)
        tau_true = (1.0 + phi) / (1.0 - phi)
        tau = integrated_autocorr_time(chain)[0]
        assert abs(tau - tau_true) / tau_true < 0.25, (phi, tau, tau_true)


def test_iid_chain_is_clean():
    rng = np.random.default_rng(1)
    chain = rng.normal(size=(500, 32, 3))
    tau = integrated_autocorr_time(chain)
    assert np.all(tau < 1.7)
    assert np.all(effective_sample_size(chain) > 500 * 32 / 1.7)
    assert np.all(np.abs(split_rhat(chain) - 1.0) < 0.02)


def test_drift_flags_rhat():
    rng = np.random.default_rng(2)
    chain = rng.normal(size=(400, 16, 2))
    chain[200:, :, 0] += 5.0  # second half jumps: non-stationary
    rhat = split_rhat(chain)
    assert rhat[0] > 1.5 and abs(rhat[1] - 1.0) < 0.05


def test_short_chain_warns():
    rng = np.random.default_rng(3)
    s = chain_summary(_ar1_chain(rng, 0.9, s=60, w=8))
    assert not s["converged"]
    assert "WARNING" in format_summary(s)
    long = chain_summary(rng.normal(size=(400, 16, 2)))
    assert long["converged"]
    assert "WARNING" not in format_summary(long)


def test_stuck_walker_does_not_crash():
    rng = np.random.default_rng(4)
    chain = rng.normal(size=(200, 8, 2))
    chain[:, 3, 1] = 7.0  # constant trace
    tau = integrated_autocorr_time(chain)
    assert np.all(np.isfinite(tau))
