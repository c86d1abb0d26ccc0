"""Pallas histogram kernel vs np.histogram (interpret mode on CPU)."""
import numpy as np
import pytest

from mcmctoffitting_tpu.ops.pallas_hist import pallas_weighted_histogram


@pytest.mark.parametrize("r,n,bins", [(4, 4096, 50), (10, 5000, 45),
                                      (3, 2048, 128)])
def test_matches_numpy(r, n, bins):
    rng = np.random.default_rng(0)
    v = rng.uniform(-0.1, 1.1, (r, n)).astype(np.float32)
    w = rng.uniform(0, 2, (r, n)).astype(np.float32)
    got = np.asarray(pallas_weighted_histogram(v, w, 0.0, 1.0, bins,
                                               interpret=True))
    assert got.shape == (r, bins)
    for i in range(r):
        want, _ = np.histogram(v[i], bins, (0.0, 1.0), weights=w[i])
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=1e-3)


def test_padding_rows_and_samples():
    rng = np.random.default_rng(1)
    v = rng.uniform(0, 1, (5, 3000)).astype(np.float32)  # 5 % 8, 3000 % 2048
    w = np.ones_like(v)
    got = np.asarray(pallas_weighted_histogram(v, w, 0.0, 1.0, 20,
                                               interpret=True))
    assert got.shape == (5, 20)
    for i in range(5):
        want, _ = np.histogram(v[i], 20, (0.0, 1.0))
        np.testing.assert_array_equal(got[i], want.astype(np.float32))


def test_right_edge_semantics():
    v = np.array([[1.0, 0.0, 0.99999, 1.0001, -0.1]] * 8, np.float32)
    v = np.pad(v, ((0, 0), (0, 2043)), constant_values=5.0)  # out of range
    w = np.ones_like(v)
    got = np.asarray(pallas_weighted_histogram(v, w, 0.0, 1.0, 10,
                                               interpret=True))
    assert got[0, -1] == 2.0  # 1.0 and 0.99999
    assert got[0, 0] == 1.0
    assert got[0].sum() == 3.0  # out-of-range dropped
