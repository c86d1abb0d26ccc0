"""PPC tooling: posterior draws -> spectra, bands, SDEF export."""
import jax
import numpy as np

from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.utils.ppc import (PPCSampler, collapse_neutron_spectrum,
                                          make_sdef_sia_cumulative,
                                          percentile_bands,
                                          sample_initial_energy_dist)


def fake_chain(n_steps=60, n_walkers=8):
    """Plausible simultFit chain wandering near the guess parameters."""
    rng = np.random.default_rng(0)
    center = np.array([1878.4, 850.0, 170.0, 0.5, 5e4, 5e4])
    scales = np.array([5.0, 20.0, 10.0, 0.05, 2e3, 2e3])
    chain = center + scales * rng.standard_normal((n_steps, n_walkers, 6))
    probs = -1000.0 + rng.standard_normal((n_steps, n_walkers))
    return chain, probs


def test_ppc_generate_shapes():
    spec = simult.default_spec(n_samples=4000)
    problem = simult.SimultFitProblem(spec, n_runs=2)
    chain, probs = fake_chain()
    sampler = PPCSampler(problem, chain, probs)
    result = sampler.generate(jax.random.PRNGKey(0), n_draws=4)
    assert len(result.tof_spectra) == 2
    assert result.tof_spectra[0].shape == (4, problem.windows[0].n_bins)
    assert result.tof_spectra[1].shape == (4, problem.windows[1].n_bins)
    assert result.neutron_spectra.shape == (4, 10, 50)
    assert np.isfinite(result.tof_spectra[0]).all()


def test_percentile_bands():
    rng = np.random.default_rng(1)
    stacked = rng.normal(100, 10, (200, 50))
    bands = percentile_bands(stacked)
    assert bands.shape == (3, 50)
    assert (bands[0] <= bands[1]).all() and (bands[1] <= bands[2]).all()


def test_lnprob_cut_filters():
    spec = simult.default_spec(n_samples=2000)
    problem = simult.SimultFitProblem(spec, n_runs=2)
    chain, probs = fake_chain()
    probs[:, :4] = -1e9  # half the walkers are terrible
    sampler = PPCSampler(problem, chain, probs)
    thetas = sampler.draw_thetas(jax.random.PRNGKey(2), 50,
                                 lnprob_cut=-2000.0)
    # all draws must come from the good half
    flat_probs = probs[-50:].reshape(-1)
    good = chain[-50:].reshape(-1, 6)[flat_probs > -2000.0]
    for th in thetas:
        assert (np.abs(good - th).sum(axis=1) < 1e-9).any()


def test_sdef_card_format():
    en = np.array([2000.0, 3000.0, 4000.0])
    counts = np.array([10.0, 55.4, 3.0])
    sdef = make_sdef_sia_cumulative(en, counts, dist_number=200)
    assert sdef["si"].startswith("si200 a")
    assert " 2.000" in sdef["si"] and " 4.000" in sdef["si"]
    assert sdef["sp"].startswith("sp200")
    assert " 55" in sdef["sp"]


def test_collapse_neutron_spectrum():
    grids = np.ones((5, 10, 50))
    out = collapse_neutron_spectrum(grids)
    assert out.shape == (50,)
    np.testing.assert_allclose(out, 50.0)


def test_sample_initial_energy_dist():
    spec = simult.default_spec(n_samples=2000)
    problem = simult.SimultFitProblem(spec, n_runs=2)
    chain, probs = fake_chain()
    sampler = PPCSampler(problem, chain, probs)
    dists = sample_initial_energy_dist(jax.random.PRNGKey(3), sampler,
                                       n_samples=5, n_draws_per=5000)
    assert dists.shape == (5, spec.ed_binning.n)
    assert dists.sum() > 0


def test_rebin_and_csv_export(tmp_path):
    from mcmctoffitting_tpu.utils.ppc import export_spectrum_csv, rebin
    s = np.arange(10.0)
    r = rebin(s, 2)
    np.testing.assert_array_equal(r, [1, 5, 9, 13, 17])
    assert rebin(s, 3).shape == (3,)  # remainder dropped
    np.testing.assert_allclose(rebin(s, 3).sum(), s[:9].sum())
    # batched
    b = rebin(np.stack([s, 2 * s]), 5)
    assert b.shape == (2, 2)
    path = str(tmp_path / "spec.csv")
    export_spectrum_csv(path, [1.0, 2.0], [10.0, 20.0])
    rows = open(path).read().strip().splitlines()
    assert rows[0].startswith("1.0") and rows[1].endswith("20.0")


def test_grid_normalization_invariant():
    """PDF normalization invariant (tests/xsWeightedSampling.py:294-337):
    the normalized (x, eD) grid integrates to 1 over the bin area."""
    import jax.numpy as jnp
    from mcmctoffitting_tpu.models.forward import energy_weight_grid
    spec = simult.default_spec(n_samples=10_000)
    e0 = jnp.linspace(500.0, 1200.0, 10_000)
    grid = energy_weight_grid(spec, e0)
    area = spec.ed_binning.width * spec.x_binning.width
    norm = grid / (jnp.sum(grid) * area)
    integral = float(jnp.sum(norm) * area)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-5)
