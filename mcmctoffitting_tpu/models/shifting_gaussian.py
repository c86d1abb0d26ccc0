"""The 'shifting Gaussian' analytic study model.

Rebuild of ``tests/shiftingGaussian_brute.py``: y ~ N(m x + b, sigma) with
x marginalized uniformly over [0, 10]; three routes to the projected pdf —
closed-form erf difference (``getProjectedProb :37-47``), numerical
projection (``getNumProjectedProb :49-60``, scipy ``quad`` replaced by a
fixed-node Gauss-Legendre rule: no adaptive control flow under jit), and
the per-sample unbinned log-likelihoods built on them (``:82-111``).  Box
priors ``sigma in (0,5), b in (0,10), m in (-0.5, 0.1)`` (``:113-120``).

This is the model the reference drives through BOTH the plain ensemble
sampler and ``PTSampler`` (20 temps x 100 walkers, ``:349-360``) — use
``sampler.sample`` / ``sampler.pt.sample_pt`` here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf

X_MIN, X_MAX = 0.0, 10.0
PARAM_LO = np.array([0.0, -0.5, 0.0])   # sigma, m, b
PARAM_HI = np.array([5.0, 0.1, 10.0])


def eval_pdf(x, y, sigma, m, b):
    """Joint density in y at location x (``evalPdf``)."""
    mean = m * x + b
    return (jnp.exp(-((y - mean) ** 2) / (2.0 * sigma * sigma))
            / (sigma * jnp.sqrt(2.0 * jnp.pi)))


def projected_prob_analytic(y, m, b, sigma):
    """Closed-form x-marginal (``getProjectedProb``): the reference's exact
    expression incl. its 1/m factor (undefined at m=0, as it notes)."""
    y = jnp.asarray(y)
    arg_max = (b + m * X_MAX - y) / (jnp.sqrt(2.0) * sigma)
    arg_min = (b + m * X_MIN - y) / (jnp.sqrt(2.0) * sigma)
    return (jnp.sqrt(jnp.pi / 2.0) * sigma
            * (erf(arg_max) - erf(arg_min)) / m)


def projected_prob_numeric(y, m, b, sigma, n_nodes: int = 64):
    """Fixed-node Gauss-Legendre x-projection replacing scipy ``quad``.

    A 64-node rule integrates the Gaussian-in-x exactly to f32 precision
    over [0, 10] for the parameter box; all samples integrate in one
    broadcast (no per-sample adaptive loops)."""
    nodes, weights = np.polynomial.legendre.leggauss(n_nodes)
    xs = 0.5 * (X_MAX - X_MIN) * (nodes + 1.0) + X_MIN
    ws = 0.5 * (X_MAX - X_MIN) * weights
    y = jnp.asarray(y)[..., None]
    vals = eval_pdf(jnp.asarray(xs), y, sigma, m, b)
    return jnp.sum(vals * jnp.asarray(ws), axis=-1)


def loglike_projected(theta, observed, *, numeric: bool = False):
    """Unbinned log-likelihood from the projected pdf
    (``lnlikeFromProjProb`` / ``numLnlikeFromProjProb``)."""
    sigma, m, b = theta[0], theta[1], theta[2]
    if numeric:
        p = projected_prob_numeric(observed, m, b, sigma)
    else:
        p = projected_prob_analytic(observed, m, b, sigma)
    ll = jnp.sum(jnp.log(jnp.maximum(p, 0.0)))
    return jnp.where(jnp.isnan(ll), -jnp.inf, ll)


def lnprior(theta):
    """Strict box prior (``lnPriors :113-120``)."""
    sigma, m, b = theta[0], theta[1], theta[2]
    ok = ((sigma > 0.0) & (sigma < 5.0) & (b > 0.0) & (b < 10.0)
          & (m < 0.1) & (m > -0.5))
    return jnp.where(ok, 0.0, -jnp.inf)


def lnprob(theta, observed, *, numeric: bool = False):
    prior = lnprior(theta)
    ll = loglike_projected(theta, observed, numeric=numeric)
    return jnp.where(jnp.isneginf(prior), -jnp.inf, prior + ll)


def generate_data(key, n: int, sigma: float, m: float, b: float):
    """Draw y samples from the model (x uniform, then shifted Gaussian)."""
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), minval=X_MIN, maxval=X_MAX)
    return m * x + b + sigma * jax.random.normal(ky, (n,))


def make_log_prob_fn(observed, *, numeric: bool = False):
    obs = jnp.asarray(observed, dtype=jnp.float32)

    def logp(theta, key):
        del key
        return lnprob(theta, obs, numeric=numeric)

    return logp


def make_pt_fns(observed, *, numeric: bool = False):
    """(loglike_fn, logprior_fn) pair for ``sampler.pt.sample_pt``."""
    obs = jnp.asarray(observed, dtype=jnp.float32)

    def loglike(theta):
        return loglike_projected(theta, obs, numeric=numeric)

    return loglike, lnprior
