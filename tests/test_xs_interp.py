"""DDN cross-section spline vs scipy interp1d(kind='cubic') oracle."""
import numpy as np
import scipy.interpolate as si

from mcmctoffitting_tpu.ops.interp import CubicSpline1D, cubic_spline_coeffs
from mcmctoffitting_tpu.ops.xs import (DDN_ENERGIES_KEV, DDN_SIGMA_ZERO,
                                       ddn_xs)


def test_table_shape():
    assert DDN_ENERGIES_KEV.shape == (61,)
    assert DDN_ENERGIES_KEV[0] == 20.0
    assert DDN_ENERGIES_KEV[-1] == 10000.0
    assert DDN_SIGMA_ZERO[0] == 0.025
    assert DDN_SIGMA_ZERO[-1] == 46.5


def test_spline_matches_scipy_interp1d():
    oracle = si.interp1d(DDN_ENERGIES_KEV, DDN_SIGMA_ZERO, kind="cubic")
    q = np.linspace(25.0, 9900.0, 501)
    got = np.asarray(ddn_xs(q.astype(np.float64)))
    want = oracle(q)
    # device eval is f32; the curve spans ~3 orders of magnitude
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_clamping_semantics():
    # reference clamps queries to [20, 10000] (utilities/utilities.py:415-429)
    lo = float(ddn_xs(np.array(5.0)))
    np.testing.assert_allclose(lo, 0.025, rtol=1e-5)
    hi = float(ddn_xs(np.array(20000.0)))
    np.testing.assert_allclose(hi, 46.5, rtol=1e-5)


def test_generic_spline_matches_cubicspline():
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(0, 5, 23))
    y = np.cos(x) * x
    c = cubic_spline_coeffs(x, y)
    cs = si.CubicSpline(x, y, bc_type="not-a-knot")
    q = np.linspace(x[0], x[-1], 200)
    idx = np.clip(np.searchsorted(x, q, side="right") - 1, 0, len(x) - 2)
    dt = q - x[idx]
    mine = ((c[0][idx] * dt + c[1][idx]) * dt + c[2][idx]) * dt + c[3][idx]
    np.testing.assert_allclose(mine, cs(q), rtol=1e-12, atol=1e-12)


def test_spline_batched_coeffs():
    x = np.linspace(0, 1, 9)
    y = np.stack([np.sin(3 * x), np.cos(2 * x)], axis=1)  # (9, 2)
    c = cubic_spline_coeffs(x, y)
    assert c.shape == (4, 8, 2)
    for j in range(2):
        cs = si.CubicSpline(x, y[:, j], bc_type="not-a-knot")
        q = np.linspace(0, 1, 40)
        idx = np.clip(np.searchsorted(x, q, side="right") - 1, 0, 7)
        dt = q - x[idx]
        mine = (((c[0, idx, j] * dt + c[1, idx, j]) * dt + c[2, idx, j]) * dt
                + c[3, idx, j])
        np.testing.assert_allclose(mine, cs(q), atol=1e-12)


def test_spline_hashable_for_jit_static():
    s = CubicSpline1D.build(np.linspace(0, 1, 8), np.arange(8.0))
    assert isinstance(hash(s), int)


def test_uniform_spline_equals_original():
    """UniformCubicSpline1D with step dividing all knot spacings is EXACT
    (no uniform cell crosses a source knot)."""
    from mcmctoffitting_tpu.ops.xs import ddn_xs, ddn_xs_uniform
    q = np.linspace(20.0, 10000.0, 40001)
    a = np.asarray(ddn_xs(q.astype(np.float64)))
    b = np.asarray(ddn_xs_uniform(q.astype(np.float64)))
    np.testing.assert_allclose(b, a, rtol=5e-6, atol=1e-5)  # f32 round-off
    # clamping preserved
    np.testing.assert_allclose(float(ddn_xs_uniform(np.array(1.0))),
                               float(ddn_xs(np.array(1.0))), rtol=1e-5)
