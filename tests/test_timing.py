"""Timing kernels vs f64 numpy oracles (utilities/utilities.py:219-329)."""
import numpy as np
from scipy.special import erf

from mcmctoffitting_tpu.ops.timing import (ExGaussianTiming, GaussianTiming,
                                           ZeroDegreeTimingSpread,
                                           apply_zero_degree_expo,
                                           exgaussian_shape,
                                           zero_degree_expo_kernel)


def oracle_exgaussian_kernel(sigma=1.1910, tau=1.0110):
    lo, hi = np.ceil(-5 * sigma), np.ceil(10 * tau)
    n = int(hi - lo)
    centers = np.linspace(lo + 0.5, hi - 0.5, n)
    exp_arg = sigma ** 2 / (2 * tau ** 2) - centers / tau
    erf_arg = (sigma ** 2 - centers * tau) / (np.sqrt(2) * sigma * tau)
    vals = np.exp(exp_arg) * (1 - erf(erf_arg))
    return centers, vals / vals.sum()


def test_exgaussian_kernel_matches_oracle():
    centers, want = oracle_exgaussian_kernel()
    k = ExGaussianTiming().kernel
    assert k.shape == want.shape == (16,)
    np.testing.assert_allclose(k, want, rtol=1e-6)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)


def test_exgaussian_shape_values():
    centers, want = oracle_exgaussian_kernel()
    got = np.asarray(exgaussian_shape(centers, 1.1910, 1.0110))
    # f32 device eval (erfc-stable form); tail values are ~1e-5 of peak
    np.testing.assert_allclose(got / got.sum(), want, rtol=1e-3, atol=1e-8)


def test_exgaussian_convolution_same_mode():
    rng = np.random.default_rng(3)
    spec = rng.uniform(0, 100, 50)
    bt = ExGaussianTiming()
    got = np.asarray(bt.apply_spreading(spec))
    want = np.convolve(spec, bt.kernel, "same")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    assert got.shape == spec.shape


def test_gaussian_timing_kernel():
    # reference hardcodes support linspace(-20, 20, 11)
    g = GaussianTiming(2.7, 4)
    centers = np.linspace(-20, 20, 11)
    want = np.exp(-((centers / 2.7) ** 2) / 2)
    want /= want.sum()
    np.testing.assert_allclose(g.kernel, want, rtol=1e-6)


def test_zero_degree_expo_kernel_and_trim():
    k = zero_degree_expo_kernel()
    centers = np.linspace(0, 24, 7)
    want = np.exp(-centers / 2.0)
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-6)

    spec = np.arange(25.0)
    got = np.asarray(apply_zero_degree_expo(spec))
    full = np.convolve(spec, want, "full")[: -len(centers) + 1]
    np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-5)
    assert got.shape == spec.shape


def test_zero_degree_segments():
    z = ZeroDegreeTimingSpread()
    # oracle (utilities/utilities.py:154-192)
    seg = 3.81 / 10
    xlocs = np.linspace(seg / 2, 3.81 - seg / 2, 10)
    e_n = 5000.0
    xs = (4.83 / np.sqrt(e_n / 1000) - 0.578) * 1e-24
    w = np.exp(-xs * 4.82e22 * xlocs)
    w /= w.sum()
    tofs, weights = z.times_and_weights(e_n)
    np.testing.assert_allclose(np.asarray(weights), w, rtol=1e-5)
    assert np.asarray(tofs).shape == (10,)
    # batched
    tofs_b, weights_b = z.times_and_weights(np.array([4000.0, 5000.0]))
    assert np.asarray(tofs_b).shape == (2, 10)
    np.testing.assert_allclose(np.asarray(weights_b).sum(axis=-1), 1.0,
                               rtol=1e-6)
