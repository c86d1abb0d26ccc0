"""Pallas TPU kernel: exact Poisson sampling (counts-mode hot stage).

WHY: the hoist-corrected stage split (tools/tpu_chain_probe3.py, r4)
shows the counts-mode forward is POISSON-bound — ``ops/poisson.
poisson_ptrs`` costs 0.92 of the ~1.4 ms per-run eval at W=1024, and
most of that is threefry bit generation (2 uniforms per PTRS round, ~6
lock-step rounds) plus the full-polynomial ``gammaln`` in the slow
accept test.  This kernel keeps BOTH algorithms exactly (Hormann PTRS
for lam >= 10, fixed-round CDF inversion below — the same exact-sampling
contract as ops/poisson.py, no normal approximation anywhere) and
removes the two cost drivers:

* random bits come from the TPU's hardware PRNG
  (``pltpu.prng_random_bits``) instead of threefry arithmetic;
* ``gammaln`` is a shifted Stirling series (exact to ~1e-7 for x >= 8,
  8-shift below), a handful of VPU ops instead of XLA's branchy
  polynomial;
* the whole sampler is ONE fused VMEM-resident kernel (no HBM round
  trips between rejection rounds).

STREAM CONTRACT: draws follow the exact Poisson distribution but on a
DIFFERENT random stream than the XLA path (hardware PRNG vs threefry) —
the same documented contract as the ``-prng rbg`` knob.  Chains seeded
identically under the two backends therefore differ sample-by-sample
while targeting the identical posterior; distribution parity is pinned
by tests/test_pallas_poisson.py (moments + exactness of the inversion
path vs scipy) and the posterior A/B in artifacts/.

PTRS reference: W. Hormann, "The transformed rejection method for
generating Poisson random variables" (1993) — the same algorithm numpy
and ops/poisson.py use; fixed 12 masked rounds (lane miss probability
0.06^12 ~ 2e-15; misses fall back to round(lam) like the XLA path's
64-round guard).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SMALL_CUTOFF = 10.0
_INV_ROUNDS = 48
_PTRS_ROUNDS = 12
_LN_SQRT_2PI = 0.9189385332046727


def _gammaln_stirling(x):
    """gammaln(x) for x >= 1: Stirling at x >= 8, 8-shifted below.

    Max |err| ~ 1e-7 at the x = 8 seam (the 1/(12z) - 1/(360 z^3)
    series); the shift product is evaluated on min(x, 8) so it can never
    overflow for large x.
    """
    xs = jnp.minimum(x, 8.0)                     # shift operand (safe)
    z = jnp.where(x < 8.0, x + 8.0, x)
    zi = 1.0 / z
    s = ((z - 0.5) * jnp.log(z) - z + _LN_SQRT_2PI
         + zi * (1.0 / 12.0 - zi * zi * (1.0 / 360.0)))
    prod = (xs * (xs + 1.0) * (xs + 2.0) * (xs + 3.0)
            * (xs + 4.0) * (xs + 5.0) * (xs + 6.0) * (xs + 7.0))
    return jnp.where(x < 8.0, s - jnp.log(prod), s)


def _poisson_kernel(seed_ref, lam_ref, out_ref):
    # independent bits per grid tile and per call: both key words + tile
    # id (mixed arithmetically — program_id cannot feed prng_seed
    # directly; int32 wraparound is fine for seeding)
    s0 = seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527)
    pltpu.prng_seed(s0, seed_ref[1])
    lam = lam_ref[:]                                       # (Wt, Ct)
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    def unif():
        bits = pltpu.bitcast(pltpu.prng_random_bits(lam.shape), jnp.uint32)
        # top 24 bits -> [0, 1) at f32 resolution (matches jax.random);
        # mosaic has no uint32->f32 cast, so bitcast the (sign-safe,
        # < 2^24) shifted value through int32 first
        top = pltpu.bitcast(bits >> 8, jnp.int32)
        return top.astype(jnp.float32) * jnp.float32(2.0 ** -24)

    small = lam < _SMALL_CUTOFF

    # ---- small-rate lanes: fixed-round CDF inversion (ops/poisson.py) --
    v_inv = jnp.maximum(1.0 - unif(), 1e-5)
    small_lam = jnp.where(small, lam, 1.0)

    def sbody(i, carry):
        p, s, cnt = carry
        s = s - p
        cnt = cnt + (s >= v_inv).astype(jnp.float32)
        p = p * small_lam / (i.astype(jnp.float32) + 1.0)
        return p, s, cnt

    _, _, cnt_small = jax.lax.fori_loop(
        0, _INV_ROUNDS, sbody,
        (jnp.exp(-small_lam), jnp.ones_like(lam), jnp.zeros_like(lam)))

    # ---- large-rate lanes: PTRS, fixed masked rounds ------------------
    big_lam = jnp.where(small, 100.0, lam)
    slam = jnp.sqrt(big_lam)
    loglam = jnp.log(big_lam)
    b = 0.931 + 2.53 * slam
    a = -0.059 + 0.02483 * b
    log_invalpha = jnp.log(1.1239 + 1.1328 / (b - 3.4))
    vr = 0.9277 - 3.6224 / (b - 2.0)

    # the round loop carries the done mask as f32 0/1 — mosaic fails to
    # legalize scf.for with vector<i1> loop carries
    def pbody(_, carry):
        done_f, res = carry
        done = done_f > 0.5
        u = unif() - 0.5
        v = jnp.maximum(unif(), tiny)
        us = 0.5 - jnp.abs(u)
        k = jnp.floor((2.0 * a / jnp.maximum(us, tiny) + b) * u
                      + big_lam + 0.43)
        fast = jnp.logical_and(us >= 0.07, v <= vr)
        reject = jnp.logical_or(
            k < 0.0, jnp.logical_and(us < 0.013, v > us))
        log_acc = (jnp.log(v) + log_invalpha
                   - jnp.log(a / jnp.maximum(us * us, tiny) + b))
        # cancellation-free log pmf around d = k - lam (exact f32 diff);
        # the naive k*loglam - lam - gammaln(k+1) form loses ~1e-2 abs
        # at lam >= 1e4, and even the d-form's k*log1p(t) amplifies the
        # backend log1p's ~1e-6 ABSOLUTE f32 error to ~0.2 at lam = 1e5
        # (-1.3% sampled variance) — so small-t lanes expand the log1p
        # in-place.  See ops/poisson._ptrs_log_pmf for the derivation
        # and error budget; this is its kernel twin.
        d = k - big_lam
        kk = jnp.maximum(k, 1.0)
        t = jnp.where(k >= 8.0, d / big_lam, 0.0)
        r = t * t * (-1.0 / 2.0 + t * (1.0 / 3.0 + t * (
            -1.0 / 4.0 + t * (1.0 / 5.0
                              + t * (-1.0 / 6.0 + t * (1.0 / 7.0))))))
        core = jnp.where(jnp.abs(t) <= 0.0625,
                         -(d * d) / big_lam - k * r,
                         d - k * jnp.log1p(t))
        log_pmf = jnp.where(
            k >= 8.0,
            core
            - 0.5 * jnp.log(2.0 * np.pi * kk)
            - (1.0 / 12.0 - (1.0 / 360.0) / (kk * kk)) / kk,
            k * loglam - big_lam - _gammaln_stirling(k + 1.0))
        slow = log_acc <= log_pmf
        accept = jnp.logical_or(fast, jnp.logical_and(~reject, slow))
        take = jnp.logical_and(~done, accept)
        done = jnp.logical_or(done, accept)
        return (done.astype(jnp.float32), jnp.where(take, k, res))

    done_f, cnt_big = jax.lax.fori_loop(
        0, _PTRS_ROUNDS, pbody,
        (small.astype(jnp.float32), jnp.zeros_like(lam)))
    cnt_big = jnp.where(done_f > 0.5, cnt_big, jnp.round(big_lam))

    out_ref[:] = jnp.where(small, cnt_small, cnt_big)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def _poisson_pallas_2d(seed, lam, row_tile: int = 32):
    """lam (R, C) f32 -> exact Poisson draws (R, C) f32.

    row_tile=32: the rejection loops carry several live full-tile f32
    arrays in vector registers; big tiles (256 rows) overflowed the
    mosaic register budget at C=640.  (32, 640) = 20 registers per live
    array compiles comfortably and the grid amortizes launch overhead.
    """
    r, c = lam.shape
    rt = min(row_tile, max(8, r))
    r_pad = -r % rt
    c_pad = -c % 128
    if r_pad or c_pad:
        lam = jnp.pad(lam, ((0, r_pad), (0, c_pad)))
    rp, cp = lam.shape
    out = pl.pallas_call(
        _poisson_kernel,
        grid=(rp // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rt, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cp), jnp.float32),
    )(jax.lax.bitcast_convert_type(seed.astype(jnp.uint32), jnp.int32),
      lam.astype(jnp.float32))
    return out[:r, :c]


@jax.custom_batching.custom_vmap
def poisson_pallas(seed, lam):
    """Exact Poisson draws via the fused TPU kernel.

    seed: (2,) uint32 (e.g. ``jax.random.key_data(key)``); lam: (C,) or
    (R, C) f32.  Under ``vmap`` (the sampler's per-walker batch) the
    batched rule collapses all leading axes into ONE kernel call — the
    per-walker (C,)-shaped calls would otherwise each become an 8x
    sublane-padded tile.
    """
    lam2 = jnp.atleast_2d(lam)
    out = _poisson_pallas_2d(seed, lam2)
    return out.reshape(lam.shape)


@poisson_pallas.def_vmap
def _poisson_pallas_vmap(axis_size, in_batched, seed, lam):
    seed_b, lam_b = in_batched
    if not lam_b:
        lam = jnp.broadcast_to(lam, (axis_size,) + lam.shape)
    if seed_b:
        # one hardware stream per call is enough for independence across
        # lanes (bits are per-element); fold the batched key words down
        # to a single (2,) seed so the kernel signature stays scalar
        seed2 = seed.reshape(axis_size, -1).astype(jnp.uint32)
        folded = jax.lax.reduce(seed2, np.uint32(0),
                                jax.lax.bitwise_xor, (0,))
        seed = folded[:2]
    flat = lam.reshape(-1, lam.shape[-1])
    # recurse through the custom-vmap function (NOT _poisson_pallas_2d):
    # under NESTED vmap (e.g. walkers outer x runs inner when the run
    # axis is batched) the outer batch level then hits this same rule and
    # collapses too — calling the kernel directly would leave the outer
    # level to JAX's default pallas batching, which cannot batch the
    # SMEM seed operand (BlockSpec error)
    out = poisson_pallas(seed, flat).reshape(lam.shape)
    return out, True
