"""Gradient-based samplers: HMC (with step-size adaptation) and
random-walk Metropolis.

Coverage for the reference's pymc3 experiments
(``tests/testSimpleNested.py:181-220``: ``find_MAP`` + NUTS and Metropolis
on simple analytic models).  The flagship Monte-Carlo likelihoods are
stochastic and non-differentiable in the pseudo-marginal sense, so the
ensemble samplers remain the workhorse; HMC applies to the deterministic
models (shifting-Gaussian, template fits) where JAX gradients are exact.

Design: static leapfrog trajectories under ``lax.scan`` with jittered
trajectory lengths (per Neal, statistically comparable to dynamic
termination on well-conditioned targets), dual-averaging step-size
adaptation toward a target acceptance rate during warm-up, identity mass
matrix.  A true dynamic-termination NUTS lives in ``sampler/nuts.py``;
this HMC remains the cheaper fixed-shape option.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class HMCState(NamedTuple):
    position: jax.Array
    log_prob: jax.Array
    grad: jax.Array
    key: jax.Array


@dataclasses.dataclass
class HMCChain:
    positions: jax.Array    # (S, C, D) for C parallel chains
    log_probs: jax.Array    # (S, C)
    accept_prob: jax.Array  # (S, C)
    step_size: float


def _leapfrog(logp_and_grad, q, p, grad, step_size, n_steps_max, n_active,
              inv_mass):
    """Leapfrog with a traced active length: the scan runs a static
    ``n_steps_max`` iterations but integration freezes after ``n_active``
    (compiler-friendly stand-in for a dynamic trajectory length)."""
    def body(carry, i):
        q, p, grad = carry
        p1 = p + 0.5 * step_size * grad
        q1 = q + step_size * (inv_mass * p1)
        _, grad1 = logp_and_grad(q1)
        p1 = p1 + 0.5 * step_size * grad1
        live = i < n_active
        q = jnp.where(live, q1, q)
        p = jnp.where(live, p1, p)
        grad = jnp.where(live, grad1, grad)
        return (q, p, grad), None

    (q, p, grad), _ = jax.lax.scan(body, (q, p, grad),
                                   jnp.arange(n_steps_max))
    return q, p, grad


def hmc_sample(key, p0, n_steps: int, log_prob_fn: Callable, *,
               n_warmup: int = 200, n_leapfrog: int = 16,
               init_step_size: float = 0.1, target_accept: float = 0.8,
               jitter: float = 0.2, segment_steps: int = 0):
    """Run C parallel HMC chains. p0: (C, D). Returns HMCChain.

    Warm-up adapts the step size by dual averaging; sampling keeps it fixed
    (mass matrix = identity; standardize parameters beforehand for the best
    behavior).  Each iteration integrates a trajectory of random length
    drawn uniformly from ``[(1-jitter)*L, (1+jitter)*L]`` (Neal's jittered
    trajectories — avoids the resonance pathologies NUTS solves with its
    dynamic tree, while keeping a static-shape program).
    ``segment_steps > 0`` caps dispatch length, bitwise-identically
    (sampler/_adapt.scan_segments — see nuts_sample's note).
    """
    p0 = jnp.asarray(p0, dtype=jnp.float32)
    n_chains, n_dim = p0.shape
    vlogp_grad = jax.vmap(jax.value_and_grad(log_prob_fn))
    inv_mass = jnp.ones(n_dim)

    len_lo = max(1, int(round(n_leapfrog * (1.0 - jitter))))
    len_hi = max(len_lo, int(round(n_leapfrog * (1.0 + jitter))))

    lp0, g0 = vlogp_grad(p0)

    # --- dual averaging warm-up (shared scanned impl, _adapt.py) ---
    def one_step(state, step_size, step_key):
        q, lp, grad, _ = state
        k_mom, k_acc, k_len = jax.random.split(step_key, 3)
        p = jax.random.normal(k_mom, q.shape)
        n_active = jax.random.randint(k_len, (), len_lo, len_hi + 1)
        q_new, p_new, grad_new = _leapfrog(
            vlogp_grad, q, p, grad, step_size, len_hi, n_active, inv_mass)
        lp_new, grad_new = vlogp_grad(q_new)
        h_old = lp - 0.5 * jnp.sum(p * p, axis=-1)
        h_new = lp_new - 0.5 * jnp.sum(p_new * p_new, axis=-1)
        log_alpha = jnp.minimum(0.0, h_new - h_old)
        accept = (jnp.log(jax.random.uniform(k_acc, (q.shape[0],)))
                  < log_alpha)
        q = jnp.where(accept[:, None], q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        grad = jnp.where(accept[:, None], grad_new, grad)
        return (q, lp, grad), jnp.exp(log_alpha)

    from ._adapt import dual_averaging_warmup, scan_segments

    def warm_step(state, eps, k):
        return one_step((state[0], state[1], state[2], None), eps, k)

    state, eps = dual_averaging_warmup(key, (p0, lp0, g0), warm_step,
                                       n_warmup, init_step_size,
                                       target_accept, segment_steps)
    step_size = float(eps)

    # --- sampling ---
    def scan_step(carry, step_key):
        state = carry
        new_state, alpha = one_step((state[0], state[1], state[2], None),
                                    jnp.float32(step_size), step_key)
        return new_state, (new_state[0], new_state[1], alpha)

    keys = jax.random.split(jax.random.fold_in(key, 999_999), n_steps)
    _, (qs, lps, alphas) = scan_segments(scan_step, state, keys,
                                         segment_steps)
    return HMCChain(qs, lps, alphas, step_size)


def metropolis_sample(key, p0, n_steps: int, log_prob_fn: Callable, *,
                      proposal_scale=0.1):
    """Gaussian random-walk Metropolis, C parallel chains (p0: (C, D))."""
    p0 = jnp.asarray(p0, dtype=jnp.float32)
    scale = jnp.broadcast_to(jnp.asarray(proposal_scale, jnp.float32),
                             (p0.shape[-1],))
    vlogp = jax.vmap(log_prob_fn)
    lp0 = vlogp(p0)

    def step(carry, step_key):
        q, lp = carry
        k_prop, k_acc = jax.random.split(step_key)
        prop = q + scale * jax.random.normal(k_prop, q.shape)
        lp_new = vlogp(prop)
        accept = (jnp.log(jax.random.uniform(k_acc, (q.shape[0],)))
                  < lp_new - lp)
        q = jnp.where(accept[:, None], prop, q)
        lp = jnp.where(accept, lp_new, lp)
        return (q, lp), (q, lp, accept)

    keys = jax.random.split(key, n_steps)
    _, (qs, lps, acc) = jax.lax.scan(step, (p0, lp0), keys)
    return qs, lps, acc
