"""Fused Pallas transport+moments kernel (interpret mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.config import SIMULTFIT_X_BINNING
from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.models.forward import energy_weight_grid
from mcmctoffitting_tpu.ops.pallas_forward import (
    bethe_closed_form_constants, fused_transport_moments)
from mcmctoffitting_tpu.ops.stopping import d2_gas_stopping


def test_closed_form_dedx_matches_bethe():
    st = d2_gas_stopping()
    a, p, q = bethe_closed_form_constants(st)
    e = np.linspace(250.0, 2300.0, 29)
    want = np.asarray(st.dedx(jnp.asarray(e, jnp.float32)))
    got = -(a / e) * (p + q * np.log(e))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_matches_xla_grid():
    st = d2_gas_stopping()
    rng = np.random.default_rng(0)
    e0 = rng.uniform(500.0, 1200.0, 4096).astype(np.float32)
    # the fused kernel implements the rk4 transport, so compare against
    # the rk4 XLA path (the spec default is now the table surrogate)
    spec = dataclasses.replace(
        simult.default_spec(n_samples=4096, transport="rk4"),
        rk4_substeps=1)
    g_xla = energy_weight_grid(spec, jnp.asarray(e0))
    from mcmctoffitting_tpu.models.forward import _taylor_coeffs
    moments = np.asarray(fused_transport_moments(
        e0, st, SIMULTFIT_X_BINNING.centers, 200.0, 1200.0, 50,
        n_substeps=1, n_blk=2048, interpret=True))
    g_fused = (moments * _taylor_coeffs(spec)[None]).sum(axis=1)
    g_xla = np.asarray(g_xla)
    m = g_xla > 1e-2 * g_xla.max()
    rel = np.abs(g_fused[m] - g_xla[m]) / g_xla[m]
    assert rel.max() < 1e-4, rel.max()


def test_fused_spec_path_matches_default():
    """ForwardSpec.use_pallas route through energy_weight_grid (interpret
    only works via direct call, so compare the flag plumbing on CPU with
    interpret monkeypatching)."""
    import mcmctoffitting_tpu.ops.pallas_forward as pf
    orig = pf.fused_transport_moments

    def interp_version(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pf.fused_transport_moments = interp_version
    try:
        spec = dataclasses.replace(
            simult.default_spec(n_samples=2048, transport="rk4"),
            use_pallas=True)
        spec_ref = dataclasses.replace(spec, use_pallas=False)
        e0 = jnp.linspace(500.0, 1200.0, 2048)
        g1 = energy_weight_grid(spec, e0)
        g0 = energy_weight_grid(spec_ref, e0)
        g0, g1 = np.asarray(g0), np.asarray(g1)
        m = g0 > 1e-2 * g0.max()
        assert (np.abs(g1[m] - g0[m]) / g0[m]).max() < 1e-4
    finally:
        pf.fused_transport_moments = orig


def test_fused_vmap_batch():
    """vmap over the walker axis (how the sampler calls it)."""
    st = d2_gas_stopping()
    rng = np.random.default_rng(1)
    e0 = rng.uniform(500.0, 1200.0, (3, 2048)).astype(np.float32)

    out_b = np.asarray(jax.vmap(
        lambda e: fused_transport_moments(
            e, st, SIMULTFIT_X_BINNING.centers, 200.0, 1200.0, 50,
            n_substeps=1, n_blk=2048, interpret=True))(jnp.asarray(e0)))
    for r in range(3):
        single = np.asarray(fused_transport_moments(
            e0[r], st, SIMULTFIT_X_BINNING.centers, 200.0, 1200.0, 50,
            n_substeps=1, n_blk=2048, interpret=True))
        np.testing.assert_allclose(out_b[r], single, rtol=1e-5, atol=1e-3)
