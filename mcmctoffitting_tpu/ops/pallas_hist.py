"""Pallas TPU kernel: fused weighted histogram.

The forward model's scatter-heavy op is the XS-weighted energy histogram
(SURVEY.md §7.3: "needs a good Pallas/segment_sum design").  The XLA path
(``ops/histogram.py``) scans chunked one-hot matmuls; each scan step
materializes a (batch, chunk, bins) one-hot through HBM.  This kernel keeps
the entire inner pipeline in VMEM: a (rows, n_blk) tile of values+weights is
loaded once, the one-hot block is built and contracted on the MXU in place,
and the (rows, bins) accumulator lives in the output block across the
sample-tile grid dimension (classic revisited-output accumulation).

Semantics match ``np.histogram(v, bins, range=(lo, hi), weights=w)``.

STATUS — measured alternative, NOT on the production path: on v5e this
kernel LOST to the XLA one-hot scan it was built to replace (73 ms vs
40 ms at the flagship mc shapes; RESULTS_r3.md "kernel fight"), so
``ops/histogram.weighted_histogram`` remains the production op.  The
kernel is kept (with its parity tests) as the measured A/B record; the
``weighted_histogram_auto`` dispatcher that once routed shapes here was
deleted in round 4 (it had no callers).  The counts-path bound analysis
that superseded this line of attack lives in RESULTS_r4.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(v_ref, w_ref, o_ref, *, lo, hi, n_bins, n_valid, n_blk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    v = v_ref[:]  # (r_blk, n_blk)
    w = w_ref[:]
    scale = n_bins / (hi - lo)
    idx = jnp.floor((v - lo) * scale).astype(jnp.int32)
    idx = jnp.clip(idx, 0, n_bins - 1)
    in_range = (v >= lo) & (v <= hi)
    # mask padded tail of the sample axis
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
    valid = col + j * n_blk < n_valid
    w = jnp.where(in_range & valid, w, 0.0)

    bins = jax.lax.broadcasted_iota(jnp.int32, (n_blk, n_bins), 1)
    r_blk = v.shape[0]

    def row_body(r, acc):
        onehot = (idx[r][:, None] == bins).astype(jnp.float32)  # (n_blk, B)
        contrib = jax.lax.dot_general(
            w[r][None, :], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (1, B)
        return acc.at[r, :].add(contrib[0])

    o_ref[:] = jax.lax.fori_loop(0, r_blk, row_body, o_ref[:])


@functools.partial(jax.jit, static_argnames=("lo", "hi", "n_bins", "r_blk",
                                             "n_blk", "interpret"))
def pallas_weighted_histogram(values, weights, lo: float, hi: float,
                              n_bins: int, *, r_blk: int = 8,
                              n_blk: int = 2048,
                              interpret: bool = False):
    """values/weights: (R, N) -> (R, n_bins) float32 histogram."""
    v = jnp.asarray(values, jnp.float32)
    w = jnp.asarray(weights, jnp.float32)
    r, n = v.shape
    r_pad = -r % r_blk
    n_pad = -n % n_blk
    if r_pad or n_pad:
        v = jnp.pad(v, ((0, r_pad), (0, n_pad)))
        w = jnp.pad(w, ((0, r_pad), (0, n_pad)))
    rp, np_ = v.shape
    grid = (rp // r_blk, np_ // n_blk)

    out = pl.pallas_call(
        functools.partial(_hist_kernel, lo=lo, hi=hi, n_bins=n_bins,
                          n_valid=n, n_blk=n_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, n_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, n_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, n_bins), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n_bins), jnp.float32),
        interpret=interpret,
    )(v, w)
    return out[:r]


