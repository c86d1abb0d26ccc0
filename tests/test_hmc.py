"""HMC and Metropolis samplers on analytic targets."""
import jax
import jax.numpy as jnp
import numpy as np

from mcmctoffitting_tpu.sampler.hmc import hmc_sample, metropolis_sample


def gaussian_logp(theta):
    return -0.5 * jnp.sum(theta ** 2)


def test_hmc_recovers_gaussian():
    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    chain = hmc_sample(jax.random.PRNGKey(1), p0, 400, gaussian_logp,
                       n_warmup=150)
    samples = np.asarray(chain.positions[100:]).reshape(-1, 3)
    assert abs(samples.mean()) < 0.1
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.12)
    # adapted step size should be sane and acceptance near target
    assert 0.01 < chain.step_size < 2.0
    assert np.asarray(chain.accept_prob).mean() > 0.5


def test_hmc_correlated_target():
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(theta):
        return -0.5 * theta @ prec @ theta

    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    chain = hmc_sample(jax.random.PRNGKey(3), p0, 500, logp, n_warmup=150)
    samples = np.asarray(chain.positions[150:]).reshape(-1, 2)
    got = np.cov(samples.T)
    np.testing.assert_allclose(got, cov, atol=0.2)


def test_metropolis_recovers_gaussian():
    p0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (16, 2))
    qs, lps, acc = metropolis_sample(jax.random.PRNGKey(5), p0, 2000,
                                     gaussian_logp, proposal_scale=0.8)
    samples = np.asarray(qs[500:]).reshape(-1, 2)
    assert abs(samples.mean()) < 0.12
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.15)
    a = np.asarray(acc).mean()
    assert 0.1 < a < 0.9


def test_hmc_on_shifting_gaussian_model():
    """HMC on the deterministic analytic model (the pymc3-experiment
    use case, tests/testSimpleNested.py)."""
    from mcmctoffitting_tpu.models import shifting_gaussian as sg
    data = sg.generate_data(jax.random.PRNGKey(6), 1500, 1.0, -0.2, 6.0)
    obs = jnp.asarray(data)

    def logp(theta):
        # soft reparam: keep sigma positive via |.| to stay differentiable
        th = jnp.stack([jnp.abs(theta[0]) + 1e-3, theta[1], theta[2]])
        return sg.loglike_projected(th, obs, numeric=True)

    p0 = (jnp.asarray([1.1, -0.22, 5.9])
          + 0.01 * jax.random.normal(jax.random.PRNGKey(7), (4, 3)))
    chain = hmc_sample(jax.random.PRNGKey(8), p0, 300, logp, n_warmup=150,
                       n_leapfrog=8)
    samples = np.asarray(chain.positions[100:]).reshape(-1, 3)
    q50 = np.percentile(samples, 50, axis=0)
    assert abs(abs(q50[0]) - 1.0) < 0.15
    assert abs((5 * q50[1] + q50[2]) - 5.0) < 0.25
