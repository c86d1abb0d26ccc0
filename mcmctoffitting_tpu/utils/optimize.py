"""MAP/ML seeding optimizers.

The reference seeds or cross-checks MCMC with scipy minimizers: TNC
(``tests/simpleTOFfit.py:267-271``), Nelder-Mead
(``tests/xsWeightedSampling.py:386-389``), SLSQP with bounds
(``tests/devShapeTemplates.py:509-518``), and pymc3 ``find_MAP``
(``tests/testSimpleNested.py``).  Here the objective is a jitted NLL; we
offer both scipy wrappers (host loop, gradient-free — appropriate for the
stochastic Monte-Carlo likelihoods, evaluated with common random numbers so
the objective is deterministic) and an optax Adam path with JAX gradients
for the deterministic likelihoods (templates).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def minimize_nll(logp_fn: Callable, x0, *, key=None, method: str = "Nelder-Mead",
                 bounds: Optional[Sequence] = None, tol: float | None = None,
                 maxiter: int | None = None):
    """Minimize -logp with scipy (TNC / Nelder-Mead / SLSQP).

    ``logp_fn(theta, key) -> scalar``; the SAME key is used for every
    evaluation (common random numbers) so the stochastic likelihood becomes
    a deterministic objective, as required by these optimizers.
    """
    from scipy import optimize as sopt

    if key is None:
        key = jax.random.PRNGKey(0)
    f = jax.jit(lambda th: -logp_fn(th, key))

    def obj(x):
        v = float(f(jnp.asarray(x, dtype=jnp.float32)))
        return v if np.isfinite(v) else 1e30

    options = {}
    if maxiter is not None:
        options["maxiter"] = maxiter
    res = sopt.minimize(obj, np.asarray(x0, dtype=np.float64),
                        method=method, bounds=bounds, tol=tol,
                        options=options or None)
    return res


def adam_map(logp_fn: Callable, x0, *, key=None, steps: int = 500,
             learning_rate: float = 1e-2):
    """Gradient-based MAP for differentiable (deterministic) log-probs."""
    import optax

    if key is None:
        key = jax.random.PRNGKey(0)
    opt = optax.adam(learning_rate)
    x = jnp.asarray(x0, dtype=jnp.float32)
    state = opt.init(x)

    @jax.jit
    def step(x, state):
        loss, grad = jax.value_and_grad(lambda t: -logp_fn(t, key))(x)
        updates, state = opt.update(grad, state)
        return optax.apply_updates(x, updates), state, loss

    loss = jnp.inf
    for _ in range(steps):
        x, state, loss = step(x, state)
    return np.asarray(x), float(loss)
