"""-convergeMain: run_phases treats n_steps as a cap and stops early once
S >= tau_factor * tau with a stable tau estimate (emcee's convergence
recipe).  The reference hard-codes every chain length per driver
(``tests/simultFit.py:733-786``), which the round-3 parity study showed
under-samples degenerate ridges by ~10x; this closes that loop."""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.cli._driver import run_phases
from mcmctoffitting_tpu.sampler import init_state, make_logp_batch


def _gaussian_setup(n_walkers=32):
    def logp(theta, key):
        del key  # deterministic target
        return -0.5 * jnp.sum(theta**2)

    logp_batch = make_logp_batch(logp)
    p0 = jax.random.normal(jax.random.PRNGKey(0), (n_walkers, 2))
    state = init_state(jax.random.PRNGKey(1), p0, logp_batch)
    return state, logp_batch


def test_adaptive_phase_stops_early(tmp_path):
    state, logp_batch = _gaussian_setup()
    cap = 3000
    path = str(tmp_path / "mainchain.dat")
    _, total_steps, _ = run_phases(
        state, (("main", path, cap, True),), logp_batch,
        segment=40, prefix=str(tmp_path) + "/",
        adaptive_phase="main", tau_factor=20.0, tau_rtol=0.1)
    # a 2-d standard Gaussian mixes in a handful of stretch steps; the
    # tau gate must fire long before the cap
    assert total_steps < cap
    # ... and never before the fixed ~80-step warmup window (the first
    # tau check is max(80, 2*segment) — decoupled from the flush segment
    # size so the default segment=50 cannot push it past short caps)
    assert total_steps >= max(80, 2 * 40)
    # the streamed chain matches what was actually sampled
    from mcmctoffitting_tpu.utils import chain_io
    chain, _, n_params, n_walkers, n_steps = chain_io.read_chain_text(path)
    assert (n_steps, n_walkers, n_params) == (total_steps, 32, 2)
    # and the gate held: S >= tau_factor * tau at the stop point
    from mcmctoffitting_tpu.utils.diagnostics import \
        integrated_autocorr_time
    tau = integrated_autocorr_time(chain)
    assert total_steps >= 20.0 * float(tau.max())


def test_non_adaptive_phase_runs_to_cap(tmp_path):
    state, logp_batch = _gaussian_setup()
    path = str(tmp_path / "mainchain.dat")
    _, total_steps, _ = run_phases(
        state, (("main", path, 60, True),), logp_batch,
        segment=25, prefix=str(tmp_path) + "/")
    assert total_steps == 60


def test_adaptive_other_phase_untouched(tmp_path):
    """adaptive_phase='main' must not shorten burn-in."""
    state, logp_batch = _gaussian_setup()
    burn = str(tmp_path / "burninchain.dat")
    main = str(tmp_path / "mainchain.dat")
    _, total_steps, _ = run_phases(
        state, (("burn-in", burn, 50, True), ("main", main, 2000, True)),
        logp_batch, segment=40, prefix=str(tmp_path) + "/",
        adaptive_phase="main", tau_factor=20.0, tau_rtol=0.1)
    from mcmctoffitting_tpu.utils import chain_io
    _, _, _, _, burn_steps = chain_io.read_chain_text(burn)
    assert burn_steps == 50
    assert total_steps < 50 + 2000
