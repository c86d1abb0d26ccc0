"""-resume semantics: fingerprinted checkpoints guard against silently
continuing under a different likelihood (advisor finding, round 1)."""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.cli._driver import (load_resume_state,
                                            posterior_fingerprint)
from mcmctoffitting_tpu.models import simult
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch
from mcmctoffitting_tpu.utils import chain_io


def _setup(n_samples=1000):
    spec = simult.default_spec(n_samples=n_samples)
    problem = simult.SimultFitProblem(spec, n_runs=2)
    rng = np.random.default_rng(0)
    observed = tuple(rng.poisson(200.0, w.n_bins).astype(np.float64)
                     for w in problem.windows)
    logp_batch = make_logp_batch(problem.make_log_prob_fn(observed))
    return problem, observed, logp_batch


def test_fingerprint_sensitivity():
    problem, observed, _ = _setup()
    fp = posterior_fingerprint(problem, observed)
    assert fp.shape == (32,) and fp.dtype == np.uint8
    # same inputs -> same digest
    np.testing.assert_array_equal(fp, posterior_fingerprint(problem,
                                                            observed))
    # different data -> different digest
    obs2 = (observed[0] + 1.0, observed[1])
    assert not np.array_equal(fp, posterior_fingerprint(problem, obs2))
    # different nDrawsPerEval -> different digest
    problem2, _, _ = _setup(n_samples=2000)
    assert not np.array_equal(fp, posterior_fingerprint(problem2, observed))
    # different likelihood-shaping modes -> different digest (a taylor-era
    # checkpoint resumed under e0grid/expected must re-evaluate log-probs)
    import dataclasses
    for change in ({"xs_mode": "taylor", "e0_grid_table": None},
                   {"sampling": "expected"},
                   {"bg_mode": "expected"}):
        spec2 = dataclasses.replace(problem.spec, **change)
        problem3 = dataclasses.replace(problem, spec=spec2)
        assert not np.array_equal(
            fp, posterior_fingerprint(problem3, observed)), change


def test_resume_matching_fingerprint_is_exact(tmp_path):
    problem, observed, logp_batch = _setup()
    p0 = problem.initial_walkers_from_observed(
        jax.random.PRNGKey(1), 8, observed)
    state = init_state(jax.random.PRNGKey(2), p0, logp_batch)
    path = str(tmp_path / "ck.npz")
    fp = posterior_fingerprint(problem, observed)
    chain_io.save_checkpoint(path, state, extra={"posterior_fp": fp})

    restored = load_resume_state(path, problem, observed, logp_batch)
    np.testing.assert_array_equal(np.asarray(restored.positions),
                                  np.asarray(state.positions))
    # exact continuation: stale log-probs kept verbatim
    np.testing.assert_array_equal(np.asarray(restored.log_probs),
                                  np.asarray(state.log_probs))
    assert int(restored.step) == int(state.step)


def test_resume_mismatched_fingerprint_reevaluates(tmp_path, capsys):
    problem, observed, logp_batch = _setup()
    p0 = problem.initial_walkers_from_observed(
        jax.random.PRNGKey(3), 8, observed)
    state = init_state(jax.random.PRNGKey(4), p0, logp_batch)
    # poison the stored log-probs so re-evaluation is observable
    poisoned = state._replace(log_probs=jnp.full_like(state.log_probs,
                                                      -1.2345e7))
    path = str(tmp_path / "ck.npz")
    fp = posterior_fingerprint(problem, observed)
    chain_io.save_checkpoint(path, poisoned, extra={"posterior_fp": fp})

    obs2 = (observed[0] * 2.0, observed[1])  # a different posterior
    restored = load_resume_state(path, problem, obs2, logp_batch)
    captured = capsys.readouterr()
    assert "fingerprint does not match" in captured.out
    np.testing.assert_array_equal(np.asarray(restored.positions),
                                  np.asarray(state.positions))
    assert not np.allclose(np.asarray(restored.log_probs), -1.2345e7)


def test_resume_legacy_checkpoint_without_fingerprint(tmp_path, capsys):
    """Round-1 checkpoints carry no fingerprint: treat as mismatch
    (re-evaluate) rather than trusting stale log-probs."""
    problem, observed, logp_batch = _setup()
    p0 = problem.initial_walkers_from_observed(
        jax.random.PRNGKey(5), 8, observed)
    state = init_state(jax.random.PRNGKey(6), p0, logp_batch)
    path = str(tmp_path / "ck.npz")
    chain_io.save_checkpoint(path, state)  # no extras

    restored = load_resume_state(path, problem, observed, logp_batch)
    assert "fingerprint does not match" in capsys.readouterr().out
    assert np.isfinite(np.asarray(restored.log_probs)).all()


def test_fingerprint_covers_forward_binnings():
    """A -hardcore checkpoint resumed without -hardcore has identical
    windows/observed; the fingerprint must still differ (the forward
    grid changed under the stored log-probs)."""
    import jax
    import numpy as np

    from mcmctoffitting_tpu.cli._driver import posterior_fingerprint
    from mcmctoffitting_tpu.models import onebd
    from mcmctoffitting_tpu.utils import data_io

    prob_default = onebd.OneBDProblem(
        onebd.default_spec(n_samples=2000), n_runs=2)
    prob_hardcore = onebd.OneBDProblem(
        onebd.default_spec(n_samples=2000, hardcore=True), n_runs=2)
    truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 20.0, 20.0])
    observed = data_io.synthesize_observed(jax.random.PRNGKey(0),
                                           prob_default, truth)
    fp_a = posterior_fingerprint(prob_default, observed)
    fp_b = posterior_fingerprint(prob_hardcore, observed)
    assert not np.array_equal(fp_a, fp_b)
