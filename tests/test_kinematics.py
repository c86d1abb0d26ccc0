"""Kinematics kernels vs independent f64 numpy oracles.

Oracle values computed directly from the published formulas
(reference ``utilities/utilities.py:48-73``) in float64 numpy here, so the
test imports nothing from the reference at runtime.
"""
import numpy as np

from mcmctoffitting_tpu.constants import masses, physics, q_values
from mcmctoffitting_tpu.ops.kinematics import dd_neutron_energy, tof


def oracle_dd_neutron_energy(e_d, angle_deg=0.0):
    theta = angle_deg * np.pi / 180
    r = (np.sqrt(masses.deuteron * masses.neutron * e_d)
         / (masses.neutron + masses.he3) * np.cos(theta))
    s = ((e_d * (masses.he3 - masses.deuteron) + q_values.ddn * masses.he3)
         / (masses.neutron + masses.he3))
    return (r + np.sqrt(r ** 2 + s)) ** 2


def test_dd_neutron_energy_matches_oracle():
    e_d = np.linspace(100.0, 3000.0, 57)
    got = np.asarray(dd_neutron_energy(e_d))
    np.testing.assert_allclose(got, oracle_dd_neutron_energy(e_d), rtol=2e-6)


def test_dd_neutron_energy_at_angle():
    got = np.asarray(dd_neutron_energy(900.0, lab_angle_deg=15.0))
    np.testing.assert_allclose(got, oracle_dd_neutron_energy(900.0, 15.0),
                               rtol=2e-6)


def test_dd_neutron_energy_magnitude():
    # DDN at 0 deg, E_d ~ 900 keV gives E_n ~ 4 MeV (physical check)
    en = float(dd_neutron_energy(900.0))
    assert 3500.0 < en < 4500.0


def test_tof_matches_oracle():
    e = np.linspace(100.0, 6000.0, 23)
    d = 518.055
    v = physics.speed_of_light * np.sqrt(2 * e / masses.neutron)
    np.testing.assert_allclose(np.asarray(tof(masses.neutron, e, d)),
                               d / v, rtol=2e-6)


def test_tof_scalar_broadcast():
    t = np.asarray(tof(masses.neutron, 4000.0, np.array([100.0, 200.0])))
    assert t.shape == (2,)
    assert t[1] == 2 * t[0]
