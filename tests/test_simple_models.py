"""Simple model family v0-v2.5 (tests/simpleTOFmodel.py ... intermediateTOFmodel.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.constants import TUNL_SSA_CSI, TofWindow
from mcmctoffitting_tpu.models.simple import (SimpleSpec, model_pdf,
                                              sample_tof)
from mcmctoffitting_tpu.ops.stopping import d2_gas_stopping

KEY = jax.random.PRNGKey(0)
WIN = TofWindow(175.0, 200.0, 25)


def test_v0_sample_statistics():
    """v0: E(x) = E0 + E1 x; TOF distribution matches an f64 numpy oracle
    of tests/simpleTOFmodel.py:57-76 distributionally."""
    spec = SimpleSpec(n_samples=50_000)
    theta = jnp.asarray([1100.0, -100.0, 50.0])
    tofs, weights, e_d, x = sample_tof(KEY, theta, spec,
                                       TUNL_SSA_CSI.cell_to_zero)
    assert weights is None
    tofs = np.asarray(tofs)

    rng = np.random.default_rng(0)
    from mcmctoffitting_tpu.constants import masses, physics
    import sys
    sys.path.insert(0, "tests")
    from test_kinematics import oracle_dd_neutron_energy
    L = TUNL_SSA_CSI.cell_length
    ox = rng.uniform(0, L, 50_000)
    oed = rng.normal(1100.0 - 100.0 * ox, 50.0)
    oen = oracle_dd_neutron_energy(oed)
    nd = TUNL_SSA_CSI.cell_to_zero + (L - ox)
    otof = (nd / (physics.speed_of_light * np.sqrt(2 * oen / masses.neutron))
            + ox / (physics.speed_of_light
                    * np.sqrt(2 * ((1100.0 + oed) / 2) / masses.deuteron)))
    a, _ = np.histogram(tofs, 25, WIN.range, density=True)
    b, _ = np.histogram(otof, 25, WIN.range, density=True)
    l1 = np.abs(a / a.sum() - b / b.sum()).sum()
    assert l1 < 0.05, l1


def test_v2_weights_are_xs():
    spec = SimpleSpec(poly_order=3, sigma_growth=True, xs_weighting=True,
                      convolve_beam=True, n_samples=5000,
                      add_half_zero_deg=True)
    theta = jnp.asarray([900.0, -50.0, -10.0, -5.0, 0.05, 0.01])
    tofs, weights, e_d, _ = sample_tof(KEY, theta, spec,
                                       TUNL_SSA_CSI.standoff_mid)
    assert weights is not None
    # weights equal sigma_DDN(e_d)
    from mcmctoffitting_tpu.ops.xs import ddn_xs
    np.testing.assert_allclose(np.asarray(weights),
                               np.asarray(ddn_xs(e_d)), rtol=1e-5)


def test_v25_bethe_transport_monotone():
    """v2.5: transported energies decrease with depth."""
    spec = SimpleSpec(bethe_transport=True, stopping=d2_gas_stopping(),
                      xs_weighting=True, convolve_beam=True, n_samples=5000)
    theta = jnp.asarray([900.0, 0.05])
    tofs, weights, e_d, x = sample_tof(KEY, theta, spec,
                                       TUNL_SSA_CSI.standoff_mid)
    e_d, x = np.asarray(e_d), np.asarray(x)
    # samples deeper in the cell lost more energy on average
    shallow = e_d[x < 0.5].mean()
    deep = e_d[x > 2.3].mean()
    assert deep < shallow - 5.0


def test_model_pdf_normalized():
    spec = SimpleSpec(n_samples=20_000)
    pdf = np.asarray(model_pdf(KEY, jnp.asarray([1100.0, -100.0, 50.0]),
                               spec, TUNL_SSA_CSI.cell_to_zero))
    width = (WIN.hi - WIN.lo) / WIN.n_bins
    np.testing.assert_allclose(pdf.sum() * width, 1.0, rtol=1e-4)
