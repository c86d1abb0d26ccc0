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
                 maxiter: int | None = None, eps: float = 1e-3):
    """Minimize -logp with scipy (TNC / Nelder-Mead / SLSQP).

    ``logp_fn(theta, key) -> scalar``; the SAME key is used for every
    evaluation (common random numbers) so the stochastic likelihood becomes
    a deterministic objective, as required by these optimizers.

    When ``bounds`` are given, the optimizer runs in unit-box coordinates
    z = (x - lo) / (hi - lo): the physics parameters span 5+ orders of
    magnitude (keV coefficients vs fractional sigmas vs 1e5-scale norms),
    and scipy's finite-difference gradients use ONE absolute step — unscaled,
    the step is either invisible at f32 objective resolution (TNC/SLSQP
    stall at the start point) or enormous for the small parameters.  ``eps``
    is the FD step in z units (1e-3 of each parameter's range).
    """
    from scipy import optimize as sopt

    if key is None:
        key = jax.random.PRNGKey(0)
    f = jax.jit(lambda th: -logp_fn(th, key))

    lo = hi = span = None
    if bounds is not None:
        lo = np.asarray([b[0] for b in bounds], np.float64)
        hi = np.asarray([b[1] for b in bounds], np.float64)
        # lo == hi pins the parameter (scipy's fixed-variable convention);
        # a unit span keeps the rescaling finite and z0 clamps to 0
        span = np.where(hi > lo, hi - lo, 1.0)

    def to_x(z):
        return lo + z * span if lo is not None else z

    def obj(z):
        v = float(f(jnp.asarray(to_x(z), dtype=jnp.float32)))
        return v if np.isfinite(v) else 1e30

    options = {}
    if maxiter is not None:
        # TNC spells its evaluation budget 'maxfun'
        options["maxfun" if method == "TNC" else "maxiter"] = maxiter
    if bounds is not None:
        z0 = np.clip((np.asarray(x0, np.float64) - lo) / span, 0.0, 1.0)
        if method in ("TNC", "SLSQP", "L-BFGS-B"):
            options["eps"] = eps
        z_bounds = [(0.0, 0.0) if h <= l else (0.0, 1.0)
                    for l, h in zip(lo, hi)]
        res = sopt.minimize(obj, z0, method=method,
                            bounds=z_bounds, tol=tol,
                            options=options or None)
        res.x = to_x(res.x)
        return res
    res = sopt.minimize(obj, np.asarray(x0, dtype=np.float64),
                        method=method, tol=tol, options=options or None)
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
