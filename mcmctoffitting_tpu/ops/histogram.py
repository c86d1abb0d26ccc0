"""Fixed-range weighted histograms, built for the MXU.

The reference's hot loops are numpy histograms over 1e4-2e5 Monte-Carlo
samples (``tests/simultFit.py:263-265``, ``tests/csi_oneBD.py:463``) plus a
Python ``ndenumerate`` TOF-synthesis loop (``tests/simultFit.py:286-296``).
On TPU, scatter-adds serialize badly; instead we compute the histogram as a
**one-hot matmul**: bin indices -> one-hot block (chunk x n_bins) contracted
against the weights on the MXU.  Chunking via ``lax.scan`` keeps the one-hot
block in VMEM (never materialized in HBM), so the op is compute-bound on the
systolic array rather than bandwidth/scatter-bound.

Semantics match ``np.histogram(values, bins=n, range=(lo, hi), weights=w)``:
out-of-range samples are dropped, and values exactly equal to ``hi`` land in
the last bin.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bin_index(values, lo: float, hi: float, n_bins: int):
    """np.histogram-compatible bin index; returns (idx, in_range_mask)."""
    v = jnp.asarray(values)
    scaled = (v - lo) * (n_bins / (hi - lo))
    idx = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, n_bins - 1)
    in_range = (v >= lo) & (v <= hi)
    return idx, in_range


def weighted_histogram(values, lo: float, hi: float, n_bins: int,
                       weights=None, *, chunk: int = 8192,
                       method: str = "onehot"):
    """Weighted histogram over the trailing axis.

    Args:
      values: (..., N) sample values.
      weights: (..., N) or None (counts).
      chunk: static chunk length for the scanned one-hot matmul.
      method: 'onehot' (MXU matmul, default) or 'scatter' (XLA scatter-add,
        kept for cross-checking and CPU testing).

    Returns: (..., n_bins) float32 histogram.
    """
    v = jnp.asarray(values)
    if weights is None:
        w = jnp.ones(v.shape, dtype=jnp.float32)
    else:
        w = jnp.asarray(weights, dtype=jnp.float32)
        w = jnp.broadcast_to(w, v.shape)
    idx, in_range = bin_index(v, lo, hi, n_bins)
    w = jnp.where(in_range, w, 0.0)

    if method == "scatter":
        flat_batch = int(jnp.size(v) // v.shape[-1]) if v.ndim > 1 else 1
        idx2 = idx.reshape(flat_batch, v.shape[-1])
        w2 = w.reshape(flat_batch, v.shape[-1])
        out = jax.vmap(
            lambda i, x: jnp.zeros(n_bins, jnp.float32).at[i].add(x)
        )(idx2, w2)
        return out.reshape(v.shape[:-1] + (n_bins,))

    n = v.shape[-1]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1)
        w = jnp.concatenate(
            [w, jnp.zeros(w.shape[:-1] + (pad,), w.dtype)], axis=-1)
    # (..., K, chunk) -> scan over K accumulating (..., n_bins)
    idx_c = jnp.moveaxis(
        idx.reshape(idx.shape[:-1] + (n_chunks, chunk)), -2, 0)
    w_c = jnp.moveaxis(w.reshape(w.shape[:-1] + (n_chunks, chunk)), -2, 0)

    bins = jnp.arange(n_bins, dtype=jnp.int32)

    def body(acc, inputs):
        i_blk, w_blk = inputs  # (..., chunk)
        onehot = (i_blk[..., None] == bins).astype(w_blk.dtype)
        # (..., chunk) x (..., chunk, n_bins) -> (..., n_bins) on the MXU
        acc = acc + jax.lax.dot_general(
            w_blk[..., None, :], onehot,
            dimension_numbers=(((w_blk.ndim,), (onehot.ndim - 2,)),
                               (tuple(range(w_blk.ndim - 1)),
                                tuple(range(onehot.ndim - 2)))),
            preferred_element_type=jnp.float32,
        )[..., 0, :]
        return acc, None

    acc0 = jnp.zeros(v.shape[:-1] + (n_bins,), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (idx_c, w_c))
    return out


def weighted_histogram_moments(values, lo: float, hi: float, n_bins: int,
                               channels, *, chunk: int = 8192):
    """Multi-channel weighted histogram: C weight channels in one MXU pass.

    values: (..., N); channels: (..., C, N) -> (..., C, n_bins).
    The one-hot block is built once per chunk and contracted against all C
    channels in a single dot — the marginal cost of extra channels is tiny.
    Used for the gather-free Taylor cross-section weighting
    (``models/forward.py``): channels (1, delta, delta^2).
    """
    v = jnp.asarray(values)
    ch = jnp.asarray(channels, dtype=jnp.float32)
    idx, in_range = bin_index(v, lo, hi, n_bins)
    ch = jnp.where(in_range[..., None, :], ch, 0.0)

    n = v.shape[-1]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1)
        ch = jnp.concatenate(
            [ch, jnp.zeros(ch.shape[:-1] + (pad,), ch.dtype)], axis=-1)
    idx_c = jnp.moveaxis(idx.reshape(idx.shape[:-1] + (n_chunks, chunk)),
                         -2, 0)
    # (..., C, K, chunk) -> (K, ..., C, chunk)
    ch_c = jnp.moveaxis(ch.reshape(ch.shape[:-1] + (n_chunks, chunk)),
                        -2, 0)

    bins = jnp.arange(n_bins, dtype=jnp.int32)
    batch_nd = idx_c.ndim - 2  # leading batch dims after K

    def body(acc, inputs):
        i_blk, c_blk = inputs  # (..., chunk), (..., C, chunk)
        onehot = (i_blk[..., None] == bins).astype(c_blk.dtype)
        # (..., C, chunk) x (..., chunk, B) -> (..., C, B)
        contrib = jax.lax.dot_general(
            c_blk, onehot,
            dimension_numbers=(((c_blk.ndim - 1,), (onehot.ndim - 2,)),
                               (tuple(range(batch_nd)),
                                tuple(range(batch_nd)))),
            preferred_element_type=jnp.float32)
        return acc + contrib, None

    acc0 = jnp.zeros(ch.shape[:-1] + (n_bins,), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (idx_c, ch_c))
    return out


def histogram_density(hist, lo: float, hi: float):
    """Convert a count/weight histogram to np.histogram(density=True) form."""
    h = jnp.asarray(hist)
    n_bins = h.shape[-1]
    width = (hi - lo) / n_bins
    total = jnp.sum(h, axis=-1, keepdims=True)
    return h / (total * width)
