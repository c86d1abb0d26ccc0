"""Reduced-dimension diagnostic fits: freeze a subset of parameters.

Generalizes ``tests/simultFit_oneParam.py`` (a 1-parameter joint fit used to
diagnose the full 9-parameter simultFit: fix everything except E0 and walk
only that, ``tests/simultFit_oneParam.py:395-407``).  Wrap any problem's
log-prob with a mask of frozen values; the sampler sees only the free
subspace.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FixedParamProblem:
    """View of a full problem with some parameters frozen.

    ``template``: full-dimension parameter vector holding the frozen values
    (free entries ignored).  ``free_mask``: bool array, True = sampled.
    """

    base: object                 # any problem with make_log_prob_fn
    template: tuple
    free_mask: tuple

    @classmethod
    def freeze(cls, base, template, free_indices) -> "FixedParamProblem":
        template = tuple(float(v) for v in np.asarray(template))
        mask = np.zeros(len(template), dtype=bool)
        mask[list(free_indices)] = True
        return cls(base, template, tuple(bool(b) for b in mask))

    @property
    def n_dim(self) -> int:
        return int(np.sum(self.free_mask))

    def expand(self, theta_free):
        """(n_free,) -> full parameter vector with frozen values filled."""
        full = jnp.asarray(self.template, dtype=jnp.float32)
        idx = np.nonzero(np.asarray(self.free_mask))[0]
        return full.at[jnp.asarray(idx)].set(jnp.asarray(theta_free))

    def make_log_prob_fn(self, observed, **kwargs):
        base_logp = self.base.make_log_prob_fn(observed, **kwargs)

        def logp(theta_free, key):
            return base_logp(self.expand(theta_free), key)

        return logp

    def collapse(self, theta_full):
        idx = np.nonzero(np.asarray(self.free_mask))[0]
        return np.asarray(theta_full)[..., idx]
