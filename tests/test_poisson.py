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

from mcmctoffitting_tpu.ops.poisson import _ptrs_log_pmf, poisson_ptrs


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


@pytest.mark.parametrize("lam", [10.0, 100.0, 1e3, 1e4, 1e5, 2e5])
def test_slow_accept_log_pmf_stable_at_large_lam(lam):
    """The PTRS slow-accept compares log(v)-scale O(1) quantities against
    the Poisson log-pmf; the naive f32 ``k*log(lam) - lam - gammaln(k+1)``
    carries ~1e-2 absolute rounding at lam = 1e4 (enough to bias the
    sampler's variance by +2%), and even the d-centred rewrite's
    ``k*log1p(d/lam)`` amplifies the BACKEND log1p's ~1e-6 absolute f32
    error to ~0.2 at lam = 1e5 (-1.3% variance, caught on-chip by
    artifacts/pallas_poisson_validation.json).  The in-place small-t
    expansion must track scipy's f64 log-pmf to ~3e-4 absolute across
    the whole proposal range, INCLUDING the k < 8 tail lanes."""
    ks = np.unique(np.concatenate([
        np.arange(0.0, 9.0),                                  # tail lanes
        np.round(lam + np.sqrt(lam) * np.linspace(-8, 8, 81)),
    ]))
    ks = ks[ks >= 0.0].astype(np.float32)
    got = np.asarray(_ptrs_log_pmf(
        jnp.asarray(ks), jnp.float32(lam), jnp.float32(np.log(lam))))
    want = stats.poisson.logpmf(ks.astype(np.float64), lam)
    # the k<8 naive branch at huge lam is dominated by -lam (exact); its
    # log-pmf is ~-1e5 where absolute slack scales with the magnitude
    tol = 3e-4 + 3e-7 * np.abs(want)
    # beyond the |t| <= 1/16 series domain (> 6.2 sigma at lam = 1e4) the
    # library log1p branch carries its k-amplified backend error — by
    # construction that far tail is >= 19 nats below the peak, where a
    # ~0.3 slack cannot influence the acceptance
    tol = np.where(np.abs(ks - lam) > lam / 16.0, 0.3, tol)
    assert np.all(np.abs(got - want) < tol), np.abs(got - want).max()


def test_small_branch_pmf_head():
    d = _draws(1.5, 500_000, seed=4)
    for k in range(5):
        p_exact = stats.poisson.pmf(k, 1.5)
        se = np.sqrt(p_exact * (1 - p_exact) / len(d))
        assert abs(np.mean(d == k) - p_exact) < 5 * se
