"""Pallas TPU kernel: fused Bethe transport + moment-histogram pipeline.

This is the forward model's entire hot path in one VMEM-resident kernel:
for each tile of initial energies, integrate the Bethe ODE to every x-bin
center with fixed-step RK4 (closed-form dE/dx, no gathers) and immediately
reduce each depth's energies into within-bin offset moment histograms
(1, d, d^2, d^3) via an MXU one-hot contraction.  Nothing but the final
(x_bins, 4, eD_bins) moments ever leaves VMEM.

The XLA path (``models/forward.energy_weight_grid``) does the same
computation as a ``lax.scan``; this kernel exists to control scheduling and
memory placement explicitly.  Equivalence is tested in interpret mode; the
forward model selects it via ``ForwardSpec.use_pallas``.

Bethe dE/dx reduction used here (see ``ops/stopping.BetheStopping.dedx``):
    dE/dx = -(A / E) * (P + Q * ln E)
with A, P, Q baked from the material stack at trace time:
    v^2 = 2 E c^2 / m_ion
    leading = 4 pi z^2 / (m_e c^2 v^2) = (2 pi z^2 m_ion / m_e) / (c^2 E) ...
    folded into A; P collects sum_i n_i ln(4 m_e / (m_ion I_i)), Q = sum n_i.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import masses, physics
from .stopping import FIXED_FACTOR, BetheStopping


def bethe_closed_form_constants(stopping: BetheStopping):
    """(A, P, Q) with dE/dx = -(A/E) * (P + Q ln E); matches
    BetheStopping.dedx algebraically."""
    c2 = physics.speed_of_light ** 2
    # dedx = -FIXED * [4 pi z^2 / (m_e c^2 v^2)] * sum_i n_i ln(2 m_e v^2/(c^2 I_i))
    # with v^2 = 2 E c^2 / m_ion:
    #   bracket  = 4 pi z^2 m_ion / (2 m_e c^4 E)        -> A / E
    #   ln arg   = 4 m_e E / (m_ion I_i)                 -> P + Q ln E
    a = (FIXED_FACTOR * 4.0 * np.pi * stopping.ion_charge ** 2
         * stopping.ion_mass / (2.0 * masses.electron * c2 * c2))
    n_e = stopping._electron_densities()
    excitations = np.array([m[3] for m in stopping.materials])
    q = float(n_e.sum())
    p = float(np.sum(n_e * np.log(4.0 * masses.electron
                                  / (stopping.ion_mass * excitations))))
    return float(a), p, q


def _fused_kernel(e0_ref, valid_ref, out_ref, *, spans, n_substeps, a_const,
                  p_const, q_const, lo, hi, n_bins, energy_floor, n_blk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    e = e0_ref[0, :]            # (n_blk,)
    valid = valid_ref[0, :]
    bins = jax.lax.broadcasted_iota(jnp.int32, (n_blk, n_bins), 1)
    inv_width = n_bins / (hi - lo)

    def dedx(en):
        en = jnp.maximum(en, energy_floor)
        return -(a_const / en) * (p_const + q_const * jnp.log(en))

    chans_rows = []
    idx_rows = []
    for span in spans:
        h = span / n_substeps
        for _ in range(n_substeps):
            stopped = e <= energy_floor
            k1 = dedx(e)
            k2 = dedx(e + 0.5 * h * k1)
            k3 = dedx(e + 0.5 * h * k2)
            k4 = dedx(e + h * k3)
            e_new = jnp.maximum(
                e + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4),
                energy_floor)
            e = jnp.where(stopped, e, e_new)
        u = (e - lo) * inv_width
        idx = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n_bins - 1)
        in_range = (e >= lo) & (e <= hi)
        delta = u - idx.astype(u.dtype) - 0.5
        base = jnp.where(in_range, valid, 0.0)
        d2 = delta * delta
        chans_rows.append(jnp.stack(
            [base, base * delta, base * d2, base * d2 * delta],
            axis=0))                                     # (4, n_blk)
        idx_rows.append(idx)
    # one batched MXU contraction over all x-bins at once
    chans = jnp.stack(chans_rows)                        # (M, 4, n_blk)
    idx_all = jnp.stack(idx_rows)                        # (M, n_blk)
    onehot = (idx_all[:, :, None] == bins[None]).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        chans, onehot, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (M, 4, B)
    out_ref[0, :, :, :] = out_ref[0, :, :, :] + contrib


@functools.partial(jax.jit, static_argnames=(
    "stopping", "x_centers_key", "n_substeps", "lo", "hi", "n_bins",
    "energy_floor", "n_blk", "interpret"))
def _fused_moments_impl(e0, valid, *, stopping, x_centers_key, n_substeps,
                        lo, hi, n_bins, energy_floor, n_blk, interpret):
    x_centers = np.asarray(x_centers_key, dtype=np.float64)
    spans = tuple(np.diff(np.concatenate([[0.0], x_centers])).tolist())
    a_const, p_const, q_const = bethe_closed_form_constants(stopping)
    r, n = e0.shape
    n_pad = -n % n_blk
    if n_pad:
        e0 = jnp.pad(e0, ((0, 0), (0, n_pad)), constant_values=lo)
        valid = jnp.pad(valid, ((0, 0), (0, n_pad)))
    grid = (r, e0.shape[1] // n_blk)
    m = len(spans)

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, spans=spans, n_substeps=n_substeps,
            a_const=a_const, p_const=p_const, q_const=q_const, lo=lo,
            hi=hi, n_bins=n_bins, energy_floor=energy_floor, n_blk=n_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, 4, n_bins), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, m, 4, n_bins), jnp.float32),
        interpret=interpret,
    )(e0, valid)
    return out


def fused_transport_moments(e0, stopping: BetheStopping, x_centers,
                            lo: float, hi: float, n_bins: int, *,
                            n_substeps: int = 1, energy_floor: float = 20.0,
                            n_blk: int = 2048, interpret: bool = False):
    """(R, N) initial energies -> (R, M, 4, n_bins) moment histograms.

    Fused Pallas pipeline; equals the XLA path in
    ``models/forward.energy_weight_grid`` (taylor mode) up to f32 round-off.
    """
    e0 = jnp.asarray(e0, jnp.float32)
    squeeze = e0.ndim == 1
    if squeeze:
        e0 = e0[None]
    valid = jnp.ones_like(e0)
    out = _fused_moments_impl(
        e0, valid, stopping=stopping,
        x_centers_key=tuple(float(x) for x in np.asarray(x_centers)),
        n_substeps=n_substeps, lo=float(lo), hi=float(hi),
        n_bins=int(n_bins), energy_floor=float(energy_floor),
        n_blk=int(n_blk), interpret=interpret)
    return out[0] if squeeze else out
