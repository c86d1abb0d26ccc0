"""End-to-end: both flagship CLIs driven through a reference-format TSV.

The reference was built around measured multistandoff TAC files
(``tests/simultFit.py:47``, ``utilities/utilities.py:198-216``) but ships
no data; these tests synthesize fixtures in its exact format (lowBinEdge
\\t run0 \\t run1 ...) and run the full fit drivers on them.
"""
import jax
import numpy as np
import pytest

from mcmctoffitting_tpu.utils import data_io


def _fixture_tsv(path, problem, theta_truth, edges, key):
    """Place truth-parameter model spectra into a full TAC time axis."""
    n_runs = len(problem.windows)
    counts = np.zeros((len(edges), n_runs))
    rng = np.random.default_rng(0)
    counts += rng.poisson(3.0, counts.shape)  # ambient TAC noise
    observed = data_io.synthesize_observed(key, problem, theta_truth)
    for run, w in enumerate(problem.windows):
        mask = (edges >= w.lo) & (edges < w.hi)
        assert mask.sum() == w.n_bins, "fixture axis must tile the window"
        counts[mask, run] = np.asarray(observed[run])
    data_io.write_multi_standoff_tof_data(str(path), edges, counts)


@pytest.mark.slow
def test_simult_fit_cli_on_tsv(tmp_path, monkeypatch):
    from mcmctoffitting_tpu.models import simult
    spec = simult.default_spec(n_samples=5000)
    problem = simult.SimultFitProblem(spec, n_runs=2)
    truth = np.array([1878.4, 850.0, 170.0, 0.5, 5e4, 5e4])
    edges = np.arange(100.0, 300.0, 1.0)  # 1 ns TAC bins (2016 campaign)
    path = tmp_path / "multistandoff.dat"
    _fixture_tsv(path, problem, truth, edges, jax.random.PRNGKey(0))

    monkeypatch.chdir(tmp_path)
    from mcmctoffitting_tpu.cli.simult_fit import main
    # 16 walkers: divisible by the 8-device test mesh (the CLI auto-shards)
    out = main(["-debug", "1", "-nRuns", "2", "-batch", "1", "-nWalkers",
                "16", "-datafile", str(path), "-segment", "5"])
    q = out["quantiles"]
    assert set(q) == {"beamE", "eLoss", "scale", "s", "N1", "N2"}
    # the 10-step debug chain must at least be live and near the box
    assert 1825.0 <= q["beamE"][0] <= 1925.0
    assert np.isfinite(out["walker_steps_per_sec"])
    # chain files written and parseable
    from mcmctoffitting_tpu.utils import chain_io
    chain, probs, n_params, n_walkers, n_steps = \
        chain_io.read_chain_text(str(tmp_path / "mainchain.dat"))
    assert n_params == 6 and n_steps == 10
    assert np.isfinite(probs).any()


@pytest.mark.slow
def test_csi_onebd_cli_on_tsv(tmp_path, monkeypatch):
    from mcmctoffitting_tpu.models import onebd
    spec = onebd.default_spec(n_samples=5000)
    problem = onebd.OneBDProblem(spec, n_runs=3)
    truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 5e4, 20.0, 20.0, 20.0])
    edges = np.arange(40.0, 260.0, 4.0)  # 4 ns bins (oneBD campaign)
    path = tmp_path / "oneBD_mcmcInputData.dat"
    _fixture_tsv(path, problem, truth, edges, jax.random.PRNGKey(1))

    monkeypatch.chdir(tmp_path)
    from mcmctoffitting_tpu.cli.csi_onebd import main
    out = main(["-debug", "1", "-batch", "1", "-nWalkers", "16",
                "-inputDataFilename", str(path), "-segment", "5"])
    q = out["quantiles"]
    assert set(q) == {"eLoss", "scale", "s", "N1", "N2", "N3",
                      "BG1", "BG2", "BG3"}
    assert np.isfinite(out["walker_steps_per_sec"])
