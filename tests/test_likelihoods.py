"""Likelihood semantics vs f64 oracles of the reference forms."""
import numpy as np
from scipy.special import gammaln
from scipy.stats import norm, poisson

from mcmctoffitting_tpu.ops.likelihoods import (box_lnprior,
                                                multinomial_loglike,
                                                poisson_binned_loglike,
                                                poisson_logpmf_loglike,
                                                template_gaussian_loglike)


def oracle_multinomial(model_pdf, obs):
    """Reference lnlike zero-guard loop (utilities/utilities.py:113-124)."""
    with np.errstate(divide="ignore"):   # zero pdf bins -> -inf on purpose
        logm = np.log(model_pdf)
    zero_idx = np.where(obs == 0)[0]
    for idx in zero_idx:
        if logm[idx] == -np.inf:
            logm[zero_idx] = 0
    return np.dot(logm, obs)


def test_multinomial_basic():
    rng = np.random.default_rng(1)
    pdf = rng.uniform(0.01, 1.0, 25)
    pdf /= pdf.sum()
    obs = rng.poisson(100, 25).astype(np.float64)
    got = float(multinomial_loglike(pdf, obs))
    np.testing.assert_allclose(got, oracle_multinomial(pdf.copy(), obs),
                               rtol=1e-4)


def test_multinomial_zero_model_zero_obs_ok():
    pdf = np.array([0.5, 0.5, 0.0])
    obs = np.array([10.0, 5.0, 0.0])
    got = float(multinomial_loglike(pdf, obs))
    np.testing.assert_allclose(got, oracle_multinomial(pdf.copy(), obs.copy()),
                               rtol=1e-5)
    assert np.isfinite(got)


def test_multinomial_zero_model_with_data_is_neg_inf():
    pdf = np.array([0.5, 0.0, 0.5])
    obs = np.array([10.0, 5.0, 1.0])
    assert float(multinomial_loglike(pdf, obs)) == -np.inf


def oracle_poisson_binned(model, obs):
    """Reference loop (tests/simultFit.py:389-409)."""
    model = model.copy()
    obs = obs.copy()
    out = []
    for b in range(len(obs)):
        if obs[b] == 0:
            obs[b] = 1
        if model[b] == 0:
            model[b] = 1
        p = -obs[b] - gammaln(int(model[b]) + 1)
        if model[b] > 0:
            p += model[b] * np.log(obs[b])
        out.append(obs[b] * p)
    return np.sum(out)


def test_poisson_binned_matches_reference_form():
    rng = np.random.default_rng(4)
    model = rng.uniform(0, 500, 45)
    model[3] = 0.0
    obs = rng.poisson(200, 45).astype(np.float64)
    obs[7] = 0.0
    got = float(poisson_binned_loglike(model, obs))
    want = oracle_poisson_binned(model, obs)
    # f32 gammaln + 45-bin sum of ~1e4-magnitude terms: ~1e-5 relative
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_poisson_binned_nan_guard():
    model = np.array([10.0, np.nan, 20.0])
    obs = np.array([12.0, 8.0, 18.0])
    assert float(poisson_binned_loglike(model, obs)) == -np.inf


def test_poisson_logpmf_correct_form():
    model = np.array([5.0, 10.0, 0.5])
    obs = np.array([4.0, 12.0, 0.0])
    got = float(poisson_logpmf_loglike(model, obs))
    want = poisson.logpmf(obs.astype(int), model).sum()
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_template_gaussian_matches_reference_form():
    # integer-count model bins (the reference's own input class): the
    # sub-count clamp is invisible here and the form matches bin-by-bin
    rng = np.random.default_rng(9)
    model = np.rint(rng.uniform(0, 1000, 25))
    obs = rng.poisson(500, 25).astype(np.float64)
    obs[2] = 0
    model[5] = 0
    obs_c = np.where(obs == 0, 1, obs)
    model_c = np.where(model == 0, 1, model)
    want = (norm.logpdf(model_c, obs_c, obs_c * 0.07)
            + norm.logpdf(obs_c, model_c, model_c * 0.15)).sum()
    got = float(template_gaussian_loglike(model, obs))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_template_gaussian_subcount_clamp():
    """A density-smear tail bin (1e-5 counts) against an empty observed
    bin must cost the same as an exactly-zero one — not ~1e9 chi-square
    (the reference's integer-count inputs never exercise this class;
    see the docstring)."""
    model = np.array([500.0, 1e-5])
    obs = np.array([480.0, 0.0])
    model_zero = np.array([500.0, 0.0])
    got = float(template_gaussian_loglike(model, obs))
    want = float(template_gaussian_loglike(model_zero, obs))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got > -100.0


def test_template_gaussian_nonfinite_model():
    assert float(template_gaussian_loglike(
        np.array([1.0, np.inf]), np.array([1.0, 2.0]))) == -np.inf


def test_box_prior():
    lo = np.array([0.0, -1.0])
    hi = np.array([1.0, 1.0])
    assert float(box_lnprior(np.array([0.5, 0.0]), lo, hi)) == 0.0
    assert float(box_lnprior(np.array([1.5, 0.0]), lo, hi)) == -np.inf
    # inclusive bounds accept the boundary (tests/simultFit.py:437-442)
    assert float(box_lnprior(np.array([1.0, 1.0]), lo, hi,
                             inclusive=True)) == 0.0
    assert float(box_lnprior(np.array([1.0, 1.0]), lo, hi,
                             inclusive=False)) == -np.inf


def test_per_bin_terms_sum_to_totals():
    """poisson_binned_terms / poisson_logpmf_terms (the checkLikelihoodEval
    table) must sum to their loglike totals bin by bin."""
    from mcmctoffitting_tpu.ops.likelihoods import (poisson_binned_terms,
                                                    poisson_logpmf_terms)
    rng = np.random.default_rng(7)
    model = rng.uniform(0.0, 400.0, 40)
    model[3] = 0.0                          # zero-model clamp path
    obs = rng.poisson(np.maximum(model, 1.0)).astype(np.float64)
    obs[5] = 0.0                            # zero-observed clamp path
    for terms_fn, total_fn in [
            (poisson_binned_terms, poisson_binned_loglike),
            (poisson_logpmf_terms, poisson_logpmf_loglike)]:
        terms = np.asarray(terms_fn(model, obs), np.float64)
        np.testing.assert_allclose(terms.sum(), float(total_fn(model, obs)),
                                   rtol=1e-6)
    # NaN model bin: binned terms go per-bin -inf under the oneBD guard
    model_nan = model.copy()
    model_nan[2] = np.nan
    t = np.asarray(poisson_binned_terms(model_nan, obs))
    assert np.isneginf(t[2])
