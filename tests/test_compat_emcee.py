"""emcee 2.x API shim: reference driver patterns run unmodified.

Exercises ``mcmctoffitting_tpu.compat.emcee`` with the exact call shapes
the reference scripts use (``/root/reference/tests/simultFit.py:701-790``
segment loops with lnprob0/rstate0 resume; ``tests/
shiftingGaussian_brute.py:352-363`` PTSampler sample->reset->sample) on
both backends: host (arbitrary numpy log-probs, the literal reference
case) and jax (traceable log-probs, compiled stretch moves).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mcmctoffitting_tpu.compat import emcee

D = 2
S_PRIOR, SIG = 3.0, 1.0
POST_STD = (1.0 / S_PRIOR ** 2 + 1.0 / SIG ** 2) ** -0.5


def _lnpost_host(p, scale=1.0):
    # float() forces concretization -> not JAX-traceable (host backend)
    return -0.5 * float(np.sum((np.asarray(p) / scale) ** 2))


def _lnpost_jax(p, scale=1.0):
    return -0.5 * jnp.sum((p / scale) ** 2)


@pytest.mark.parametrize("lnpost,backend", [(_lnpost_host, "host"),
                                            (_lnpost_jax, "jax")])
def test_ensemble_sampler_reference_pattern(lnpost, backend):
    nwalkers = 24
    sampler = emcee.EnsembleSampler(nwalkers, D, lnpost,
                                    kwargs={"scale": 1.0}, threads=4,
                                    seed=7)
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((nwalkers, D))

    # burn-in segment loop, reference style
    out = None
    for i, out in enumerate(sampler.sample(p0, iterations=40)):
        pass
    assert sampler.backend == backend
    pos, prob, rstate = out
    assert pos.shape == (nwalkers, D) and prob.shape == (nwalkers,)
    assert sampler.chain.shape == (nwalkers, 40, D)

    # reset + resume with lnprob0/rstate0, reference style
    sampler.reset()
    assert sampler.chain.shape == (nwalkers, 0, D)
    n_main = 260
    for out in sampler.sample(pos, lnprob0=prob, rstate0=rstate,
                              iterations=n_main):
        pass
    assert sampler.chain.shape == (nwalkers, n_main, D)
    assert sampler.lnprobability.shape == (nwalkers, n_main)
    assert np.all(np.isfinite(sampler.flatlnprobability))

    acc = sampler.acceptance_fraction
    assert acc.shape == (nwalkers,)
    assert 0.2 < acc.mean() < 0.9

    samples = sampler.chain[:, 60:, :].reshape(-1, D)  # reference's slicing
    assert np.all(np.abs(samples.mean(axis=0)) < 0.25)
    assert np.all(np.abs(samples.std(axis=0) - 1.0) < 0.25)
    assert np.all(np.isfinite(sampler.acor))


def test_ensemble_run_mcmc_and_flatchain():
    sampler = emcee.EnsembleSampler(16, D, _lnpost_jax, seed=1)
    p0 = np.random.default_rng(1).standard_normal((16, D))
    pos, prob, rstate = sampler.run_mcmc(p0, 30)
    assert pos.shape == (16, D)
    assert sampler.flatchain.shape == (16 * 30, D)
    # continue from the stored last state
    sampler.run_mcmc(None, 10)
    assert sampler.chain.shape[1] == 40


def test_backend_jax_rejects_host_fn():
    sampler = emcee.EnsembleSampler(8, D, _lnpost_host, backend="jax")
    with pytest.raises(Exception):
        next(iter(sampler.sample(np.zeros((8, D)), iterations=1)))


def test_odd_walkers_rejected():
    with pytest.raises(ValueError, match="even"):
        emcee.EnsembleSampler(7, D, _lnpost_jax)


def _logl(p, sig=SIG):
    return -0.5 * jnp.sum((p / sig) ** 2) \
        - 0.5 * D * jnp.log(2 * jnp.pi * sig ** 2)


def _logprior(p):
    return -0.5 * jnp.sum((p / S_PRIOR) ** 2) \
        - 0.5 * D * jnp.log(2 * jnp.pi * S_PRIOR ** 2)


def _logl_host(p, sig=SIG):
    return float(_logl(jnp.asarray(p), sig))


@pytest.mark.parametrize("logl,logp,backend,iters", [
    (_logl, _logprior, "jax", (60, 400)),
    (_logl_host, _logprior, "host", (30, 150)),
])
def test_pt_sampler_reference_pattern(logl, logp, backend, iters):
    ntemps, nwalkers = 8, 16
    pt = emcee.PTSampler(ntemps, nwalkers, D, logl, logp, threads=10,
                         loglkwargs={"sig": SIG}, seed=3)
    rng = np.random.default_rng(2)
    p0 = 1e-3 * rng.standard_normal((ntemps, nwalkers, D))

    n_burn, n_main = iters
    for p, lnp, lnl in pt.sample(p0, iterations=n_burn):
        pass
    assert pt.backend == backend
    assert p.shape == (ntemps, nwalkers, D)
    assert lnp.shape == lnl.shape == (ntemps, nwalkers)
    pt.reset()
    for p, lnp, lnl in pt.sample(p, lnprob0=lnp, lnlike0=lnl,
                                 iterations=n_main, thin=2):
        pass
    # emcee 2 stores iterations 0, thin, 2*thin, ... -> ceil(N/thin) rows
    assert pt.chain.shape == (ntemps, nwalkers, -(-n_main // 2), D)

    # cold chain reproduces the analytic posterior
    zero_temp = pt.chain[0].reshape(-1, D)   # reference's slicing pattern
    assert np.all(np.abs(zero_temp.mean(axis=0)) < 0.25)
    assert np.all(np.abs(zero_temp.std(axis=0) - POST_STD) < 0.25)

    tswap = pt.tswap_acceptance_fraction
    assert tswap.shape == (ntemps,)
    assert np.all(tswap > 0.05) and np.all(tswap <= 1.0)


def test_pt_ti_evidence_via_shim():
    ntemps, nwalkers = 16, 32
    pt = emcee.PTSampler(ntemps, nwalkers, D, _logl, _logprior, seed=5)
    p0 = np.random.default_rng(4).standard_normal(
        (ntemps, nwalkers, D)) * S_PRIOR
    for out in pt.sample(p0, iterations=500):
        pass
    ln_z, d_ln_z = pt.thermodynamic_integration_log_evidence(fburnin=0.3)
    lnz_true = D * (-0.5 * np.log(2 * np.pi * (SIG ** 2 + S_PRIOR ** 2)))
    assert abs(ln_z - lnz_true) < 0.2
    assert 0.0 < d_ln_z < 0.5


def test_thin_matches_emcee2_semantics():
    """Regression: emcee 2 stores iterations 0, thin, 2*thin, ... so
    iterations=10, thin=3 keeps 4 rows (i = 0, 3, 6, 9) — an
    (i+1) % thin rule keeps only 3 and drops the first stored step."""
    s = emcee.EnsembleSampler(8, D, _logl, seed=11)
    p0 = np.random.default_rng(1).standard_normal((8, D))
    for out in s.sample(p0, iterations=10, thin=3):
        pass
    assert s.chain.shape == (8, 4, D)
    assert s.lnprobability.shape == (8, 4)
