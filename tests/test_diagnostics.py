"""Diagnostics/optimize/profiling utilities."""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.utils.diagnostics import (acceptance_report,
                                                  effective_sample_size,
                                                  gelman_rubin,
                                                  integrated_autocorr_time,
                                                  likelihood_table,
                                                  print_likelihood_table)


def test_likelihood_table_matches_reference_form():
    from scipy.special import gammaln
    model = np.array([10.0, 0.0, 55.5])
    obs = np.array([12.0, 0.0, 50.0])
    rows = likelihood_table(model, obs)
    assert len(rows) == 3
    # clamping semantics
    assert rows[1]["obs_clamped"] == 1.0 and rows[1]["model_clamped"] == 1.0
    # contribution formula
    o, m = 12.0, 10.0
    want = o * (-o - gammaln(int(m) + 1) + m * np.log(o))
    np.testing.assert_allclose(rows[0]["contribution"], want, rtol=1e-10)
    total = print_likelihood_table(model, obs)
    np.testing.assert_allclose(total,
                               sum(r["contribution"] for r in rows))


def test_acceptance_report():
    class FakeChain:
        acceptance_fraction = np.array([0.3, 0.4, 0.5])
    rep = acceptance_report(FakeChain())
    assert rep["healthy"] and abs(rep["mean"] - 0.4) < 1e-9


def test_autocorr_white_noise_is_one():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 8))
    tau = integrated_autocorr_time(x)
    assert 0.5 < tau < 1.8


def test_autocorr_ar1_larger():
    rng = np.random.default_rng(1)
    n, w, phi = 4000, 4, 0.9
    x = np.zeros((n, w))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + rng.standard_normal(w)
    tau = integrated_autocorr_time(x)
    # AR(1) IAT = (1+phi)/(1-phi) = 19
    assert 10 < tau < 30


def test_gelman_rubin_converged_vs_not():
    rng = np.random.default_rng(2)
    good = rng.standard_normal((500, 8, 2))
    r_good = gelman_rubin(good)
    assert np.all(r_good < 1.1)
    bad = good.copy()
    bad[:, :4, 0] += 10.0  # half the walkers in a different mode
    r_bad = gelman_rubin(bad)
    assert r_bad[0] > 1.5


def test_effective_sample_size():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1000, 4, 2))
    ess = effective_sample_size(x)
    assert ess.shape == (2,)
    assert (ess > 1000).all()  # white noise: ESS ~ S*W


def test_minimize_nll_finds_gaussian_mode():
    from mcmctoffitting_tpu.utils.optimize import minimize_nll

    def logp(theta, key):
        return -0.5 * jnp.sum((theta - jnp.asarray([2.0, -1.0])) ** 2)

    res = minimize_nll(logp, np.zeros(2), method="Nelder-Mead")
    np.testing.assert_allclose(res.x, [2.0, -1.0], atol=1e-3)


def test_adam_map():
    from mcmctoffitting_tpu.utils.optimize import adam_map

    def logp(theta, key):
        return -0.5 * jnp.sum((theta - 3.0) ** 2)

    x, loss = adam_map(logp, np.zeros(3), steps=400, learning_rate=0.1)
    np.testing.assert_allclose(x, 3.0, atol=0.05)


def test_throughput_meter():
    from mcmctoffitting_tpu.utils.profiling import Throughput
    m = Throughput(n_walkers=10)
    rate = m.update(5)
    assert rate > 0 and m.steps == 5


def test_initial_energy_plot(tmp_path):
    from mcmctoffitting_tpu.utils.plotting import initial_energy_plot
    f = str(tmp_path / "e0.png")
    initial_energy_plot(1878.4, 850.0, 170.0, 0.5, f, n_samples=5000)
    import os
    assert os.path.getsize(f) > 1000


def test_model_overlay_plot(tmp_path):
    from mcmctoffitting_tpu.utils.plotting import model_overlay_plot
    rng = np.random.default_rng(5)
    obs = rng.poisson(200, 45)
    mod = obs + rng.normal(0, 10, 45)
    f = str(tmp_path / "overlay.png")
    model_overlay_plot(obs, mod, f)
    import os
    assert os.path.getsize(f) > 1000


def test_autocorr_handles_stuck_walkers():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((500, 4))
    x[:, 2] = 1.234  # stuck walker: zero variance
    from mcmctoffitting_tpu.utils.diagnostics import integrated_autocorr_time
    tau = integrated_autocorr_time(x)
    assert np.isfinite(tau) and 0.4 < tau < 2.0
    # fully stuck ensemble -> window length
    allstuck = np.ones((200, 3))
    assert integrated_autocorr_time(allstuck) == 200.0
