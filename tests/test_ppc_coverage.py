"""Unit tests for the PPC calibration metrics (tools/ppc_coverage_study.py).

Pure numpy — the study's coverage/p-value machinery is exercised on
synthetic Poisson data where the right answers are known: calibrated
observations hit nominal coverage and mid-range p-values, gross misfit
drives the omnibus p-value to 0.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ppc_coverage_study import coverage_and_pvalue  # noqa: E402


def _spectra(rng, n_draws=400, n_bins=300):
    # posterior-predictive expectations: draws scatter around a smooth curve
    base = 200.0 + 150.0 * np.sin(np.linspace(0, 3, n_bins)) ** 2
    scale = rng.normal(1.0, 0.03, size=(n_draws, 1))
    return base[None, :] * scale


def test_calibrated_data_passes():
    rng = np.random.default_rng(0)
    lam = _spectra(rng)
    # observed = one genuine draw from the same predictive distribution
    obs = rng.poisson(lam[0])
    r = coverage_and_pvalue(obs, lam, np.random.default_rng(1))
    # discreteness makes central intervals slightly conservative
    assert 0.60 < r["coverage68"] < 0.85
    assert 0.90 <= r["coverage95"] <= 1.0
    assert 0.05 < r["p_value"] < 0.95


def test_misfit_drives_p_to_zero():
    rng = np.random.default_rng(2)
    lam = _spectra(rng)
    obs = rng.poisson(lam[0] * 1.5)  # 50% normalization misfit
    r = coverage_and_pvalue(obs, lam, np.random.default_rng(3))
    assert r["p_value"] < 0.01
    assert r["coverage95"] < 0.7


def test_overdispersed_model_drives_p_to_one():
    rng = np.random.default_rng(4)
    # model predicts far more scatter than the data shows
    lam = _spectra(rng) * rng.normal(1.0, 0.3, size=(400, 1)).clip(0.2)
    obs = rng.poisson(200.0 + 150.0 * np.sin(np.linspace(0, 3, 300)) ** 2)
    r = coverage_and_pvalue(obs, lam, np.random.default_rng(5))
    # the clipped scale mixture keeps a few tight replicas, so p lands
    # ~0.95 rather than 1.0 — still clearly in the overdispersed regime
    assert r["p_value"] > 0.9
    assert r["coverage95"] == 1.0  # bands blown far wider than the data
