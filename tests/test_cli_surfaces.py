"""CLI argument surfaces: parser parity with the reference drivers.

Parsers are cheap to test (no jax); the full drivers are exercised
end-to-end by the project verify skill (.claude/skills/verify/SKILL.md).
"""
import pytest


def test_simult_fit_parser_surface():
    from mcmctoffitting_tpu.cli.simult_fit import build_parser
    p = build_parser()
    a = p.parse_args(["-nRuns", "4", "-debug", "1", "-nDrawsPerEval",
                      "100000", "-nBurninSteps", "10", "-nMainSteps", "5",
                      "-outputPrefix", "x_", "-quitEarly", "1"])
    assert a.nRuns == 4 and a.debug == 1 and a.nDrawsPerEval == 100000
    assert a.outputPrefix == "x_"
    # reference choice constraint (tests/simultFit.py:43)
    with pytest.raises(SystemExit):
        p.parse_args(["-nRuns", "9"])


def test_csi_onebd_parser_surface():
    from mcmctoffitting_tpu.cli.csi_onebd import build_parser
    p = build_parser()
    a = p.parse_args(["-qnd", "-hardcore", "-shiftTOF", "2",
                      "-nWalkers", "128"])
    assert a.qnd and a.hardcore and a.shiftTOF == 2 and a.nWalkers == 128
    # all reference flags present (tests/csi_oneBD.py:58-76); -mpi/-nThreads
    # are replaced by device-mesh sharding (-mesh) by design
    for flag in ("-run", "-inputDataFilename", "-debug", "-quitEarly",
                 "-batch", "-forceCustomPDF", "-nDrawsPerEval",
                 "-nBurninSteps", "-nMainSteps", "-outputPrefix",
                 "-nWalkers", "-qnd", "-quickish", "-hardcore", "-shiftTOF"):
        assert any(flag in str(act.option_strings) for act in p._actions), \
            f"missing reference flag {flag}"
    # rebuild-added flags
    for flag in ("-resume", "-deterministicBG"):
        assert any(flag in str(act.option_strings) for act in p._actions), \
            f"missing flag {flag}"
    a2 = p.parse_args(["-run", "2", "-forceCustomPDF", "1",
                       "-deterministicBG", "-resume", "x.ckpt.npz"])
    assert a2.run == 2 and a2.forceCustomPDF == 1
    assert a2.deterministicBG and a2.resume == "x.ckpt.npz"


def test_every_reference_flag_parses_verbatim():
    """A reference-style command line parses unchanged on both flagships.

    Every flag of ``tests/simultFit.py:42-55`` and
    ``tests/csi_oneBD.py:58-76`` — including the vestigial/ignored ones
    (-mpi, -nThreads, -forceCustomPDF, -run) and the reference's int-style
    preset spellings (-qnd 1) — must be accepted.
    """
    from mcmctoffitting_tpu.cli.csi_onebd import build_parser as onebd_p
    from mcmctoffitting_tpu.cli.simult_fit import build_parser as simult_p

    a = simult_p().parse_args(
        ["-nRuns", "4", "-mpi", "0", "-debug", "1", "-nThreads", "3",
         "-datafile", "multistandoff.dat", "-quitEarly", "0", "-batch", "1",
         "-forceCustomPDF", "0", "-nDrawsPerEval", "200000",
         "-nBurninSteps", "400", "-nMainSteps", "100"])
    assert a.nThreads == 3 and a.mpi == 0 and a.forceCustomPDF == 0

    b = onebd_p().parse_args(
        ["-run", "0", "-inputDataFilename", "x.dat", "-mpi", "0",
         "-debug", "1", "-nThreads", "5", "-quitEarly", "1", "-batch", "0",
         "-forceCustomPDF", "0", "-nDrawsPerEval", "200000",
         "-nBurninSteps", "400", "-nMainSteps", "100",
         "-outputPrefix", "", "-nWalkers", "256", "-qnd", "0",
         "-quickish", "1", "-hardcore", "0", "-shiftTOF", "2"])
    assert b.nThreads == 5 and b.quickish == 1 and b.hardcore == 0
    assert b.shiftTOF == 2


def test_sampling_flag_choices():
    """-sampling {mc,counts,expected} on both flagships; -expectedForward
    stays as the back-compat alias."""
    from mcmctoffitting_tpu.cli.csi_onebd import build_parser as onebd_p
    from mcmctoffitting_tpu.cli.simult_fit import build_parser as simult_p

    for bp in (simult_p, onebd_p):
        assert bp().parse_args(["-sampling", "counts"]).sampling == "counts"
        assert bp().parse_args([]).sampling == "mc"
        assert bp().parse_args(["-expectedForward"]).expectedForward
        with pytest.raises(SystemExit):
            bp().parse_args(["-sampling", "bogus"])


def test_simple_tof_model_configs():
    from mcmctoffitting_tpu.cli.simple_tof import MODEL_CONFIGS
    assert set(MODEL_CONFIGS) == {"v0", "v1", "v2", "v2.5"}
    assert MODEL_CONFIGS["v0"]["n_dim"] == 3      # simpleTOFmodel
    assert MODEL_CONFIGS["v1"]["n_dim"] == 5      # simpleTOFfit
    assert MODEL_CONFIGS["v2"]["n_dim"] == 6      # intermediateTOFfit
    assert MODEL_CONFIGS["v2.5"]["n_dim"] == 2    # intermediateTOFmodel
    # v0 reproduces the reference's truth and sampler scale
    assert MODEL_CONFIGS["v0"]["truth"] == (1100.0, -100.0, 50.0)
    assert MODEL_CONFIGS["v0"]["n_walkers"] == 50
    assert MODEL_CONFIGS["v0"]["n_steps"] == 500


def test_quit_early(tmp_path, monkeypatch):
    """-quitEarly stops after setup (tests/simultFit.py:549-550)."""
    monkeypatch.chdir(tmp_path)
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    from mcmctoffitting_tpu.cli.simult_fit import main
    out = main(["-quitEarly", "1", "-debug", "1", "-nRuns", "1"])
    assert out["status"] == "quitEarly"


def test_check_likelihood_eval(tmp_path, monkeypatch, capsys):
    """-checkLikelihoodEval prints the per-bin table at the guess point
    and its total equals the problem's own log_like at the same
    theta/key (reference helper tests/simultFit.py:474-512)."""
    monkeypatch.chdir(tmp_path)
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcmctoffitting_tpu.cli.simult_fit import main
    out = main(["-checkLikelihoodEval", "1", "-debug", "1", "-nRuns", "2",
                "-batch", "1", "-likelihood", "poisson"])
    assert out["status"] == "checkLikelihoodEval"
    assert np.isfinite(out["total_loglike"])
    text = capsys.readouterr().out
    assert "run 0 bin 0:" in text and "total likelihood is" in text

    # cross-check the printed total against log_like directly
    from mcmctoffitting_tpu.models import simult
    from mcmctoffitting_tpu.utils import data_io
    key = jax.random.PRNGKey(0)
    spec = simult.default_spec(n_samples=5000, xs_mode="e0grid")
    problem = simult.SimultFitProblem(spec, n_runs=2,
                                      likelihood="poisson")
    truth = np.concatenate([simult.GUESS_SHARED, np.full(2, 5.0e4)])
    observed = data_io.synthesize_observed(
        jax.random.fold_in(key, 99), problem, truth)
    theta = jnp.asarray(problem.guess_theta(observed), jnp.float32)
    ll = float(problem.log_like(theta, jax.random.fold_in(key, 3),
                                observed))
    assert abs(out["total_loglike"] - ll) < 1e-3 * max(1.0, abs(ll))


def test_shift_tof_semantics(tmp_path, monkeypatch):
    """-shiftTOF relabels count rows against the time axis before window
    selection (tests/csi_oneBD.py:698-706): counts slide by whole bins."""
    import numpy as np
    from mcmctoffitting_tpu.utils import data_io
    edges = np.arange(60.0, 240.0, 4.0)
    counts = np.column_stack([np.arange(len(edges))] * 3).astype(float)
    path = str(tmp_path / "data.tsv")
    data_io.write_multi_standoff_tof_data(path, edges, counts)

    td = data_io.read_multi_standoff_tof_data(path, 3)
    base, _ = data_io.select_window(td, 0, 80.0, 180.0)

    # emulate shift=+2 like the CLI does
    shift = 2
    e2 = td[:-shift, 0]
    td2 = td[shift:].copy()
    td2[:, 0] = e2
    shifted, _ = data_io.select_window(td2, 0, 80.0, 180.0)
    np.testing.assert_allclose(shifted, base + shift)
