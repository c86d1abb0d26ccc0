"""Constants layer parity with reference values (constants/constants.py)."""
import numpy as np

from mcmctoffitting_tpu.constants import (
    TUNL_SSA_CSI, TUNL_SSA_CSI_ONEBD, masses, onebd_consts, physics,
    q_values, tof_windows, tof_windows_onebd)


def test_physics():
    assert physics.speed_of_light == 29.9792
    np.testing.assert_allclose(physics.epsilon_0, 8.8541878188e-14, rtol=1e-9)


def test_masses():
    assert masses.deuteron == 1.8756e6
    assert masses.neutron == 939565.0
    assert masses.he3 == 2.809414e6
    assert masses.electron == 511.0


def test_q_values():
    assert q_values.ddn == 3268.914
    assert q_values.lipn == -1644.24


def test_csi_geometry_standoffs():
    g = TUNL_SSA_CSI
    # reference: standoffClose = tipToColli + colliToZero = 382.2
    np.testing.assert_allclose(g.standoff_close, 148.4 + 233.8)
    np.testing.assert_allclose(g.standoff_mid, 382.2 + 131.09)
    np.testing.assert_allclose(g.standoff_far, 382.2 + 131.09 + 52.39)
    np.testing.assert_allclose(
        g.standoff_tunl_runs, 59.45 + 355.7 + 2.341 + 148.4)
    assert g.cell_length == 2.86
    assert g.zero_deg_length == 3.81


def test_onebd_geometry_standoffs():
    g = TUNL_SSA_CSI_ONEBD
    np.testing.assert_allclose(g.standoff_close, 351.3)
    np.testing.assert_allclose(g.standoff_mid, 412.3)
    np.testing.assert_allclose(g.standoff_far, 444.5)


def test_tof_windows():
    assert tof_windows["close"].n_bins == 45
    assert tof_windows["mid"].range == (175.0, 225.0)
    assert tof_windows["far"].n_bins == 70
    assert tof_windows["production"].range == (195.0, 260.0)
    # oneBD: int((hi-lo)/4) = 25 for each window
    for name in ("close", "mid", "far"):
        assert tof_windows_onebd[name].n_bins == 25
    assert tof_windows_onebd["close"].range == (80.0, 180.0)
    assert tof_windows_onebd["far"].range == (120.0, 220.0)


def test_onebd_experiment_consts():
    assert onebd_consts.beam_reference_energy == 2490.0
    assert onebd_consts.gas_cell_attenuation_length == 20.0


def test_geometry_hashable():
    # static-arg use under jit requires hashability
    assert hash(TUNL_SSA_CSI) != hash(TUNL_SSA_CSI_ONEBD)
