"""RNG/pdf primitives vs scipy.stats distributions."""
import jax
import numpy as np
from scipy import stats

from mcmctoffitting_tpu.ops.pdfs import (beam_energy_rvs, lognorm_pdf,
                                         lognorm_rvs, skewnorm_pdf,
                                         skewnorm_rvs)


def test_lognorm_rvs_moments():
    key = jax.random.PRNGKey(0)
    s, loc, scale = 0.5, 850.0, 170.0
    x = np.asarray(lognorm_rvs(key, s, loc, scale, (200000,)))
    want_mean = stats.lognorm.mean(s, loc, scale)
    want_std = stats.lognorm.std(s, loc, scale)
    np.testing.assert_allclose(x.mean(), want_mean, rtol=5e-3)
    np.testing.assert_allclose(x.std(), want_std, rtol=2e-2)
    assert (x > loc).all()


def test_lognorm_pdf_matches_scipy():
    s, loc, scale = 0.7, 10.0, 5.0
    q = np.linspace(5.0, 60.0, 200)
    got = np.asarray(lognorm_pdf(q, s, loc, scale))
    want = stats.lognorm.pdf(q, s, loc, scale)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)


def test_skewnorm_pdf_matches_scipy():
    q = np.linspace(-5, 5, 100)
    got = np.asarray(skewnorm_pdf(q, a=3.0, loc=0.5, scale=1.2))
    want = stats.skewnorm.pdf(q, 3.0, 0.5, 1.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_skewnorm_rvs_distribution():
    key = jax.random.PRNGKey(42)
    x = np.asarray(skewnorm_rvs(key, (100000,), a=4.0, loc=2.0, scale=3.0))
    np.testing.assert_allclose(x.mean(), stats.skewnorm.mean(4.0, 2.0, 3.0),
                               rtol=2e-2)
    np.testing.assert_allclose(x.std(), stats.skewnorm.std(4.0, 2.0, 3.0),
                               rtol=3e-2)


def test_beam_energy_rvs_positive_and_distributed():
    key = jax.random.PRNGKey(7)
    # simultFit guesses (tests/simultFit.py:535-538)
    e = np.asarray(beam_energy_rvs(key, 100000, 1878.4, 850.0, 170.0, 0.5))
    assert (e > 0).mean() > 0.9999
    # distribution check: beamE - draws should match lognorm sf shape
    want_mean = 1878.4 - stats.lognorm.mean(0.5, 850.0, 170.0)
    np.testing.assert_allclose(e.mean(), want_mean, rtol=5e-3)


def test_beam_energy_rvs_redraws_negatives():
    key = jax.random.PRNGKey(3)
    # pathological params: most draws negative -> redraw budget kicks in
    e = np.asarray(beam_energy_rvs(key, 10000, 500.0, 100.0, 300.0, 1.0,
                                   n_redraw_rounds=16))
    # a meaningful fraction must have been repaired to positive
    assert (e > 0).mean() > 0.5


def test_beam_energy_rvs_truncate_mode_exact():
    """Default mode (-1) replaces non-positive samples with exact
    truncated-lognorm draws == the reference's redraw-until-positive
    rejection loop (tests/simultFit.py:245-252).  Oracle: numpy rejection
    sampling of the same truncated distribution."""
    key = jax.random.PRNGKey(11)
    beam_e, e_loss, scale, s = 500.0, 100.0, 300.0, 1.0  # ~37% negative
    e = np.asarray(beam_energy_rvs(key, 200_000, beam_e, e_loss, scale, s))
    assert (e > 0).all()

    rng = np.random.default_rng(0)
    draws = beam_e - stats.lognorm.rvs(s, e_loss, scale, size=2_000_000,
                                       random_state=rng)
    oracle = draws[draws > 0]
    np.testing.assert_allclose(e.mean(), oracle.mean(), rtol=5e-3)
    np.testing.assert_allclose(e.std(), oracle.std(), rtol=1e-2)
    ks = stats.kstest(e[:20000], lambda x: (
        np.searchsorted(np.sort(oracle), x) / len(oracle)))
    assert ks.pvalue > 1e-3, f"KS p={ks.pvalue}"


def test_beam_energy_rvs_truncate_degenerate_params():
    """No positive support (beamE <= eLoss): samples keep their first draw
    (downstream range masks / NaN guards absorb them) instead of NaNs."""
    key = jax.random.PRNGKey(12)
    e = np.asarray(beam_energy_rvs(key, 1000, 100.0, 200.0, 50.0, 0.5))
    assert np.isfinite(e).all()
