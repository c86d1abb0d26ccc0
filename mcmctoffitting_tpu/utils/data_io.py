"""Experimental data IO.

* :func:`read_multi_standoff_tof_data` — the TAC multi-standoff TSV reader
  (reference ``readMultiStandoffTOFdata``, ``utilities/utilities.py:198-216``):
  rows of ``lowBinEdge \\t run0 \\t run1 ...``; returns an (n_rows, 1+n_runs)
  array with bin lower edges in column 0.
* :func:`select_window` — slice a run's counts to a TOF window, as the
  drivers do (``tests/simultFit.py:528-532``).
* :func:`synthesize_multi_standoff_data` — generate a synthetic
  multistandoff dataset from known truth parameters with the forward model
  (for closure tests and demos; the reference ships no data files — its
  default paths point at a private home directory,
  ``tests/simultFit.py:47``).
"""
from __future__ import annotations

import numpy as np


def read_multi_standoff_tof_data(filename: str,
                                 n_runs: int = 4) -> np.ndarray:
    """Read tab-separated multi-standoff TOF data.

    Column 0: lower bin edge (ns); columns 1..n_runs: per-run counts.
    """
    rows = []
    with open(filename) as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split("\t")
            rows.append([float(parts[0])]
                        + [float(p) for p in parts[1: 1 + n_runs]])
    return np.asarray(rows)


def select_window(tof_data: np.ndarray, run: int, lo: float, hi: float):
    """Counts and bin edges of one run inside [lo, hi)
    (``tests/simultFit.py:528-532``)."""
    edges = tof_data[:, 0]
    mask = (edges >= lo) & (edges < hi)
    return tof_data[mask, run + 1], edges[mask]


def write_multi_standoff_tof_data(filename: str, lower_edges, counts):
    """Write the TSV format (counts: (n_rows, n_runs))."""
    counts = np.asarray(counts)
    with open(filename, "w") as f:
        for i, edge in enumerate(np.asarray(lower_edges)):
            cols = "\t".join(str(float(c)) for c in counts[i])
            f.write(f"{float(edge)}\t{cols}\n")


def synthesize_observed(key, problem, theta_truth, *, get_pdf=True):
    """Generate per-run synthetic observed histograms at truth parameters.

    Works for any problem exposing run_spectrum/windows (simult/onebd).
    Returns a tuple of integer count arrays (Poisson-fluctuated).
    """
    import jax
    import jax.numpy as jnp

    theta = jnp.asarray(theta_truth, dtype=jnp.float32)
    observed = []
    for run, _ in enumerate(problem.windows):
        k_run = jax.random.fold_in(key, 1000 + run)
        model = problem.run_spectrum(k_run, theta, run, get_pdf=get_pdf)
        # stays on jax.random.poisson (threefry) deliberately: synthetic
        # observed data is keyed by seed and reproduced across sessions
        # (ppc_coverage_study, resume fingerprints); swapping the sampler
        # would silently re-synthesize different data for old chains.
        # One-time setup work — not on the sampling hot path.  Under a
        # non-threefry impl (-prng rbg) jax.random.poisson raises; fall
        # back to the impl-agnostic exact sampler (different stream —
        # consistent with -prng's documented contract).
        k_noise = jax.random.fold_in(key, 2000 + run)
        try:
            counts = jax.random.poisson(k_noise, jnp.maximum(model, 0.0))
        except NotImplementedError:
            from ..ops.poisson import poisson_ptrs
            counts = poisson_ptrs(k_noise, jnp.maximum(model, 0.0))
        observed.append(np.asarray(counts, dtype=np.float64))
    return tuple(observed)
