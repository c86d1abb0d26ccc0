"""Likelihoods and priors.

Vectorized jnp re-implementations of the three likelihood families in the
reference, preserving their (sometimes idiosyncratic) numerical semantics:

* :func:`multinomial_loglike` — dot(log model-pdf, observed counts) with the
  zero-observed / -inf guard (``utilities/utilities.py:100-124``).
* :func:`poisson_binned_loglike` — the "poor man's poisson.logpmf" binned
  form with zero-bin clamping and the int() truncation inside gammaln
  (``tests/simultFit.py:380-409``), plus the oneBD NaN-bin guard
  (``tests/csi_oneBD.py:543-575``).
* :func:`template_gaussian_loglike` — the wide-Gaussian template likelihood
  (``tests/devShapeTemplates.py:272-294``).
* :func:`box_lnprior` — table-driven uniform box prior
  (``tests/simultFit.py:424-442``).

All return -inf (never NaN) on pathological inputs, reproducing the
reference's NaN->-inf guard (``tests/simultFit.py:463-468``) inside the
likelihood itself so jitted samplers never see NaN log-probabilities.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln


def multinomial_loglike(model_pdf, observed):
    """log L = sum_i obs_i * log(pdf_i) with the reference's zero guards.

    Reference semantics (``utilities/utilities.py:113-124``): bins with zero
    observed counts contribute 0 regardless of the model pdf (the explicit
    index-fixing loop there reduces to exactly this); bins with data where
    the model pdf is 0 drive the total to -inf.
    """
    model_pdf = jnp.asarray(model_pdf)
    observed = jnp.asarray(observed)
    logm = jnp.log(model_pdf)
    contrib = jnp.where(observed > 0, observed * logm, 0.0)
    total = jnp.sum(contrib)
    return jnp.where(jnp.isnan(total), -jnp.inf, total)


def poisson_binned_terms(model_counts, observed_counts, *,
                         nan_guard: bool = True):
    """Per-bin contributions of :func:`poisson_binned_loglike` (for the
    verbose ``checkLikelihoodEval`` table, ``tests/simultFit.py:474-512``)."""
    model = jnp.asarray(model_counts)
    obs = jnp.asarray(observed_counts)
    obs_c = jnp.where(obs == 0, 1.0, obs)
    model_safe = jnp.where(jnp.isnan(model), 1.0, model)
    model_c = jnp.where(model_safe == 0, 1.0, model_safe)
    # int() in the reference truncates; model counts are >= 0 so floor == int
    poi = (-obs_c - gammaln(jnp.floor(model_c) + 1.0)
           + jnp.where(model_c > 0, model_c * jnp.log(obs_c), 0.0))
    contrib = obs_c * poi
    # NaN model bins: per-bin -inf under the oneBD guard, otherwise let the
    # NaN propagate so the final total->-inf guard fires (simultFit's
    # whole-eval NaN->-inf semantics; without this the sanitized model=1
    # above would silently launder NaN into a finite value)
    return jnp.where(jnp.isnan(model),
                     -jnp.inf if nan_guard else jnp.nan, contrib)


def poisson_binned_loglike(model_counts, observed_counts, *,
                           nan_guard: bool = True):
    """Reference binned-Poisson form (``tests/simultFit.py:389-409``).

    Per bin (after clamping obs==0 -> 1 and model==0 -> 1):
        p = -obs - gammaln(floor(model) + 1) + model * log(obs)
        contribution = obs * p
    NaN model bins contribute -inf when ``nan_guard`` (oneBD behavior,
    ``tests/csi_oneBD.py:553-555``).
    """
    total = jnp.sum(poisson_binned_terms(model_counts, observed_counts,
                                         nan_guard=nan_guard))
    return jnp.where(jnp.isnan(total), -jnp.inf, total)


POISSON_RATE_FLOOR = 1e-3


def poisson_logpmf_terms(model_counts, observed_counts):
    """Per-bin contributions of :func:`poisson_logpmf_loglike`."""
    model = jnp.asarray(model_counts)
    obs = jnp.asarray(observed_counts)
    rate = jnp.maximum(model, POISSON_RATE_FLOOR)
    logpmf = obs * jnp.log(rate) - rate - gammaln(obs + 1.0)
    return jnp.where(jnp.isnan(model), -jnp.inf, logpmf)


def poisson_logpmf_loglike(model_counts, observed_counts):
    """Statistically-correct Poisson(obs | rate=model) binned likelihood.

    Offered alongside the reference form as the documented improvement:
    log pmf = obs * log(model) - model - gammaln(obs + 1).

    Model rates are floored at ``POISSON_RATE_FLOOR`` counts: the MC
    forward model can return HARD zeros in tail bins at low draw counts
    (a finite-sample artifact, not a model statement that the rate is
    exactly 0), and a -inf there makes the pseudo-marginal likelihood
    intermittently -inf even at the truth.  The floor keeps such bins a
    strong-but-finite penalty (obs * log(1e-3) ~ -6.9 per observed
    count); NaN model bins still map to -inf.
    """
    total = jnp.sum(poisson_logpmf_terms(model_counts, observed_counts))
    return jnp.where(jnp.isnan(total), -jnp.inf, total)


def template_gaussian_loglike(model_tof, observed):
    """Wide-Gaussian template likelihood (``tests/devShapeTemplates.py:272-294``).

    After clamping sub-count bins to 1:
        logN(model | obs, 0.07 obs) + logN(obs | model, 0.15 model), summed.
    Non-finite model spectra give -inf.

    Clamp semantics: the reference clamps ``== 0`` bins.  Its inputs are
    integer-count template histograms, where every sub-count tail bin IS
    exactly zero — so on its own data the reference effectively clamps
    everything below one count.  This package's templates are exact
    beam-convolved densities whose window tails carry an infinitesimal
    smear (1e-5-count bins the reference pipeline can never produce);
    under a literal ``== 0`` clamp one such bin against a clamped
    empty observation contributes (1/(0.15 * 1e-5))^2 / 2 ~ 1e9 to the
    chi-square and the posterior collapses onto the tail bins (measured:
    the template closure pinned scale4 at its box edge).  Clamping
    ``model < 1`` reproduces the reference's effective behavior on the
    integer-count inputs it was written for.
    """
    model = jnp.asarray(model_tof)
    obs = jnp.asarray(observed)
    obs_c = jnp.where(obs == 0, 1.0, obs)
    model_c = jnp.where(model < 1.0, 1.0, model)

    def norm_logpdf(x, mu, sigma):
        return (-0.5 * jnp.log(2.0 * jnp.pi * sigma ** 2)
                - (x - mu) ** 2 / (2.0 * sigma ** 2))

    ll = jnp.sum(norm_logpdf(model_c, obs_c, obs_c * 0.07)
                 + norm_logpdf(obs_c, model_c, model_c * 0.15))
    finite = jnp.isfinite(jnp.sum(model))
    return jnp.where(finite & ~jnp.isnan(ll), ll, -jnp.inf)


def box_lnprior(theta, lo, hi, *, inclusive: bool = False):
    """Uniform box prior: 0 inside, -inf outside.

    ``inclusive=False`` uses strict inequalities like the early models
    (``utilities/utilities.py:128-136``); the table-driven drivers use
    closed bounds (``tests/simultFit.py:437-442``) -> ``inclusive=True``.
    """
    theta = jnp.asarray(theta)
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    if inclusive:
        ok = jnp.all((theta >= lo) & (theta <= hi))
    else:
        ok = jnp.all((theta > lo) & (theta < hi))
    return jnp.where(ok, 0.0, -jnp.inf)
