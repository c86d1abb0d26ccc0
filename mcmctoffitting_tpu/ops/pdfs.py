"""Random variates and PDFs used by the forward models.

Functional, key-explicit equivalents of the scipy.stats calls in the
reference plus its custom skew-normal (``utilities/pdfs.py:8-28``).

The beam-energy draw — ``beamE - lognorm.rvs(s, loc, scale)`` with a
redraw-until-positive loop (``tests/simultFit.py:243-252``) — becomes a
fixed-budget masked redraw: data-dependent ``while`` loops don't exist under
jit, so we redraw a bounded number of rounds with fresh keys and keep the
first positive draw per sample.  For physical parameter regions the negative
tail is tiny, so a handful of rounds reproduces the reference's statistics
to well below Monte-Carlo noise (any stragglers keep their last draw and are
dropped later by histogram range masking, mirroring how the oneBD driver
simply disabled the redraw loop, ``tests/csi_oneBD.py:440-447``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lognorm_rvs(key, s, loc=0.0, scale=1.0, shape=()):
    """scipy.stats.lognorm.rvs(s, loc, scale): loc + scale * exp(s * Z)."""
    z = jax.random.normal(key, shape)
    return loc + scale * jnp.exp(s * z)


def lognorm_pdf(x, s, loc=0.0, scale=1.0):
    y = (jnp.asarray(x) - loc) / scale
    out = jnp.where(
        y > 0,
        jnp.exp(-jnp.log(jnp.where(y > 0, y, 1.0)) ** 2 / (2.0 * s ** 2))
        / (jnp.where(y > 0, y, 1.0) * s * jnp.sqrt(2.0 * jnp.pi) * scale),
        0.0,
    )
    return out


def skewnorm_pdf(x, a=0.0, loc=0.0, scale=1.0):
    """Custom skew-normal pdf (``utilities/pdfs.py:12-14``):
    2 phi((x-loc)/scale) Phi(a (x-loc)/scale) / scale."""
    t = (jnp.asarray(x) - loc) / scale
    phi = jnp.exp(-t * t / 2.0) / jnp.sqrt(2.0 * jnp.pi)
    cdf = 0.5 * (1.0 + jax.scipy.special.erf(a * t / jnp.sqrt(2.0)))
    return 2.0 * phi * cdf / scale


def skewnorm_rvs(key, shape=(), a=0.0, loc=0.0, scale=1.0):
    """Azzalini construction matching ``utilities/pdfs.py:16-28``
    (note the reference scales BOTH normals by `scale`)."""
    k0, k1 = jax.random.split(key)
    u0 = scale * jax.random.normal(k0, shape)
    v = scale * jax.random.normal(k1, shape)
    d = a / jnp.sqrt(1.0 + a * a)
    u1 = d * u0 + v * jnp.sqrt(1.0 - d * d)
    return jnp.where(u0 >= 0, u1, -u1) + loc


def beam_energy_rvs(key, n: int, beam_e, e_loss, scale, s,
                    n_redraw_rounds: int = -1):
    """Initial deuteron energies: beamE - lognorm(s, loc=e_loss, scale).

    The reference redraws non-positive samples until none remain
    (``tests/simultFit.py:243-252``) — i.e. it rejection-samples the
    lognorm TRUNCATED at beamE.  Two jit-friendly equivalents:

    * ``n_redraw_rounds = -1`` (default): **exact truncation** — draw every
      sample from the truncated distribution by inverse CDF
      (z = ndtri(u * Phi(z_max)), z_max = ln((beamE - eLoss)/scale)/s).
      Statistically identical to the reference's infinite-redraw loop
      (rejection sampling == truncation) at the cost of a single
      transcendental pass — no redraw rounds at all.
    * ``n_redraw_rounds >= 0``: fixed-budget masked redraw (the round-1
      scheme; 0 rounds reproduces the oneBD driver that simply disabled
      the loop, ``tests/csi_oneBD.py:440-447``).

    Degenerate parameters (beamE <= eLoss, or scale <= 0) have no positive
    support to redraw toward — the reference would spin forever
    (``while nanCount > 0``); here such samples keep their first draw and
    fall to the histogram range mask / NaN->-inf likelihood guard.
    """
    def draw(k):
        return beam_e - lognorm_rvs(k, s, e_loss, scale, (n,))

    key0, key_loop = jax.random.split(key)

    if n_redraw_rounds < 0:
        # every sample drawn from the truncated distribution directly:
        # z = ndtri(u * Phi(z_max)) — ONE transcendental pass, same cost
        # as an untruncated draw.  Invalid parameters get cdf multiplier 1
        # (a plain draw; downstream guards absorb the negatives).
        headroom = beam_e - e_loss
        valid = (headroom > 0.0) & (scale > 0.0) & (s > 0.0)
        safe_head = jnp.where(valid, headroom, 1.0)
        safe_scale = jnp.where(scale > 0.0, scale, 1.0)
        safe_s = jnp.where(s > 0.0, s, 1.0)
        z_max = jnp.log(safe_head / safe_scale) / safe_s
        cdf_max = jnp.where(valid, jax.scipy.special.ndtr(z_max), 1.0)
        u = jax.random.uniform(key0, (n,),
                               minval=jnp.finfo(jnp.float32).tiny,
                               maxval=1.0)
        z = jax.scipy.special.ndtri(u * cdf_max)
        return beam_e - (e_loss + scale * jnp.exp(s * z))

    e = draw(key0)

    def round_fn(i, e):
        k = jax.random.fold_in(key_loop, i)
        fresh = draw(k)
        return jnp.where(e <= 0.0, fresh, e)

    return jax.lax.fori_loop(0, n_redraw_rounds, round_fn, e)
