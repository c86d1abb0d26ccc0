"""Statistical oracle tests for ops/poisson.poisson_ptrs vs scipy.

Exactness contract: PTRS is an exact rejection sampler (lam >= 10) and
the small-lambda branch is exact CDF inversion (to f32 resolution, tail
floored at the 1-1e-5 quantile) — so draws must match scipy's Poisson
distribution, not just its first moment, under BOTH PRNG impls.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from mcmctoffitting_tpu.ops.poisson import poisson_ptrs


def _draws(lam, n=200_000, impl="threefry2x32", seed=0):
    key = jax.random.key(seed, impl=impl)
    return np.asarray(jax.jit(
        lambda k: poisson_ptrs(k, jnp.full((n,), lam, jnp.float32)))(key))


@pytest.mark.parametrize("lam", [0.4, 3.0, 9.5, 12.0, 37.5, 200.0, 1500.0])
def test_moments(lam):
    n = 200_000
    d = _draws(lam, n)
    assert abs(d.mean() - lam) / np.sqrt(lam / n) < 4.5
    assert abs(d.var() - lam) / (lam * np.sqrt(2.0 / n)) < 4.5


@pytest.mark.parametrize("lam", [1.5, 37.5])
def test_distribution_matches_scipy(lam):
    n = 200_000
    d = _draws(lam, n, seed=1).astype(int)
    lo = max(int(lam - 5 * np.sqrt(lam)), 0)
    hi = int(lam + 5 * np.sqrt(lam)) + 1
    obs = np.bincount(np.clip(d - lo, 0, hi - lo), minlength=hi - lo + 1)
    ks = np.arange(lo, hi + 1)
    probs = stats.poisson.pmf(ks, lam)
    probs[0] = stats.poisson.cdf(lo, lam)
    probs[-1] = 1.0 - stats.poisson.cdf(hi - 1, lam)
    chi2 = np.sum((obs - n * probs) ** 2 / np.maximum(n * probs, 1e-9))
    # dof ~ len(ks)-1; 1e-4-level threshold
    assert chi2 < stats.chi2.ppf(0.9999, len(ks) - 1), chi2


def test_zero_rate_is_zero():
    assert np.all(_draws(0.0, 10_000) == 0.0)


def test_mixed_rate_array_and_shape():
    rng = np.random.default_rng(0)
    lam = np.abs(rng.normal(50.0, 80.0, size=(64, 33))).astype(np.float32)
    key = jax.random.key(2, impl="threefry2x32")
    d = np.asarray(jax.jit(lambda k: poisson_ptrs(k, jnp.asarray(lam)))(key))
    assert d.shape == lam.shape
    assert np.all(d >= 0) and np.all(d == np.round(d))
    # aggregate z-score over cells
    z = (d - lam) / np.sqrt(np.maximum(lam, 1e-6))
    big = lam > 1.0
    assert abs(z[big].mean()) < 4.0 / np.sqrt(big.sum())  # no bias
    # extreme-tail runaway guard: nothing many sigma beyond its rate
    assert np.all(d[big] < lam[big] + 12.0 * np.sqrt(lam[big]) + 10.0)


def test_rbg_impl_supported():
    d = _draws(37.5, 100_000, impl="rbg")
    assert abs(d.mean() - 37.5) / np.sqrt(37.5 / 100_000) < 4.5
    assert abs(d.var() - 37.5) / (37.5 * np.sqrt(2.0 / 100_000)) < 4.5


def test_deterministic_under_fixed_key():
    a = _draws(20.0, 1000, seed=3)
    b = _draws(20.0, 1000, seed=3)
    assert np.array_equal(a, b)


def test_small_branch_pmf_head():
    d = _draws(1.5, 500_000, seed=4)
    for k in range(5):
        p_exact = stats.poisson.pmf(k, 1.5)
        se = np.sqrt(p_exact * (1 - p_exact) / len(d))
        assert abs(np.mean(d == k) - p_exact) < 5 * se
