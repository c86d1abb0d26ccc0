"""Differential-evolution ensemble move (sampler/stretch.py move='de').

The reference only ever drives emcee's stretch move; DE-MC (ter Braak,
emcee's DEMove) is this package's extension for degenerate-ridge mixing.
Correctness is established the same way as for the stretch move
(tests/test_sampler.py): known posteriors recovered, acceptance sane —
plus the motivating property, better mixing than stretch on a highly
anisotropic correlated Gaussian, and bitwise non-interference with the
stretch path's PRNG stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmctoffitting_tpu.sampler import (init_state, make_logp_batch,
                                        run_mcmc, sample)


def gaussian_logp(theta):
    return -0.5 * jnp.sum(theta ** 2)


@pytest.mark.parametrize("move", ["de", "mixed"])
def test_recovers_standard_gaussian(move):
    key = jax.random.PRNGKey(0)
    n_walkers, n_dim = 64, 3
    p0 = 0.1 * jax.random.normal(key, (n_walkers, n_dim))
    chain = sample(jax.random.PRNGKey(1), p0, 600, gaussian_logp,
                   stochastic=False, move=move)
    samples = np.asarray(chain.positions[200:]).reshape(-1, n_dim)
    assert abs(samples.mean()) < 0.1
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.1)
    acc = np.asarray(chain.acceptance_fraction)
    assert 0.2 < acc.mean() < 0.95


def test_anisotropic_ridge_mixes_faster_than_stretch():
    """The motivating case: a 6-d Gaussian with a 100:1 aspect-ratio
    correlated ridge (the shape of the eLoss/scale/s lognorm degeneracy).
    DE proposals are ensemble-difference vectors, so they align with the
    ridge; tau along the soft direction must beat stretch's."""
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    scales = np.array([10.0, 1.0, 1.0, 0.5, 0.3, 0.1])
    cov = (q * scales**2) @ q.T
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logp(theta):
        return -0.5 * theta @ prec @ theta

    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (64, 6))
    taus = {}
    for move in ("stretch", "de"):
        chain = sample(jax.random.PRNGKey(3), p0, 1500, logp,
                       stochastic=False, move=move)
        from mcmctoffitting_tpu.utils.diagnostics import \
            integrated_autocorr_time
        # project onto the soft (widest) direction before tau
        soft = np.asarray(chain.positions[300:]) @ q[:, 0]
        taus[move] = float(
            integrated_autocorr_time(soft[..., None]).max())
    assert taus["de"] < taus["stretch"], taus


def test_stretch_stream_unchanged_by_extension():
    """move='stretch' must reproduce the pre-extension trajectories
    bitwise (the default path's PRNG stream is load-bearing for resumed
    chains): the move dispatch may not perturb key splitting."""
    logp_batch = make_logp_batch(gaussian_logp, stochastic=False)
    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (16, 2))
    state = init_state(jax.random.PRNGKey(5), p0, logp_batch)
    default = run_mcmc(state, 25, logp_batch)
    explicit = run_mcmc(state, 25, logp_batch, move="stretch")
    np.testing.assert_array_equal(np.asarray(default.positions),
                                  np.asarray(explicit.positions))


def test_de_needs_four_walkers():
    logp_batch = make_logp_batch(gaussian_logp, stochastic=False)
    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (2, 2))
    state = init_state(jax.random.PRNGKey(7), p0, logp_batch)
    with pytest.raises(ValueError, match="4 walkers"):
        run_mcmc(state, 2, logp_batch, move="de")


def test_partners_distinct_and_symmetric_factor():
    """Structural check on the DE proposal itself: with gamma jitter off
    and a deterministic target, every proposal must displace along a
    difference of two DISTINCT complementary-half walkers — never zero
    (j1 == j2 would freeze the walker at logp-equal acceptance)."""
    from mcmctoffitting_tpu.sampler.stretch import _half_update_de

    n = 32
    pos = jnp.asarray(np.random.default_rng(1).normal(size=(n, 3)),
                      jnp.float32)
    lp = jnp.zeros(n)

    def flat_logp_batch(thetas, keys):
        return jnp.zeros(thetas.shape[0])

    for trial in range(20):
        new_pos, _, acc = _half_update_de(
            pos, lp, 0, jax.random.PRNGKey(trial), flat_logp_batch,
            0.7, 0.0)
        moved = np.asarray(new_pos[0::2] - pos[0::2])
        acc = np.asarray(acc)
        # flat target accepts everything; every displacement nonzero
        assert acc.all()
        assert (np.abs(moved).sum(axis=1) > 1e-7).all()


@pytest.mark.parametrize("move", ["de", "mixed"])
def test_pt_cold_chain_with_de(move):
    """PT carries the move family too: cold-chain correctness + live
    replica exchange under DE/mixed proposals."""
    from mcmctoffitting_tpu.sampler.pt import sample_pt

    def loglike(theta):
        return -0.5 * jnp.sum(theta ** 2)

    def logprior(theta):
        return jnp.asarray(0.0)

    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (4, 32, 2))
    chain = sample_pt(jax.random.PRNGKey(1), p0, 500, loglike, logprior,
                      move=move)
    cold = np.asarray(chain.cold_chain[200:]).reshape(-1, 2)
    assert abs(cold.mean()) < 0.12
    np.testing.assert_allclose(cold.std(axis=0), 1.0, atol=0.12)
    assert (np.asarray(chain.n_swaps_accepted) > 0).all()


def test_pt_stretch_stream_unchanged():
    from mcmctoffitting_tpu.sampler.pt import sample_pt

    def loglike(theta):
        return -0.5 * jnp.sum(theta ** 2)

    def logprior(theta):
        return jnp.asarray(0.0)

    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (3, 8, 2))
    default = sample_pt(jax.random.PRNGKey(3), p0, 30, loglike, logprior)
    explicit = sample_pt(jax.random.PRNGKey(3), p0, 30, loglike, logprior,
                         move="stretch")
    np.testing.assert_array_equal(np.asarray(default.positions),
                                  np.asarray(explicit.positions))
