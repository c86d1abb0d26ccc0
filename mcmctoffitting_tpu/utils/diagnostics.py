"""Fit diagnostics: verbose likelihood tables, acceptance, convergence.

Rebuilds the reference's debug-in-lieu-of-fixtures tooling (SURVEY.md §4
item 7): ``checkLikelihoodEval`` per-bin likelihood dumps
(``tests/simultFit.py:474-512``), verbose ``lnlikeHelp``
(``tests/simultFit_oneParam.py:198-229``), and acceptance-fraction
reporting (``tests/shiftingGaussian_brute.py:329-334``) — plus integrated
autocorrelation time and Gelman-Rubin R-hat, which the reference lacked.
"""
from __future__ import annotations

import numpy as np


def likelihood_table(model, observed) -> list[dict]:
    """Per-bin likelihood breakdown (the checkLikelihoodEval table).

    Returns one dict per bin with the clamped values and the reference
    Poisson-form contribution, for eyeballing which bins drive the fit.
    """
    from scipy.special import gammaln

    model = np.asarray(model, dtype=np.float64)
    observed = np.asarray(observed, dtype=np.float64)
    rows = []
    for b in range(len(observed)):
        o = observed[b] if observed[b] != 0 else 1.0
        m = model[b] if model[b] != 0 else 1.0
        poi = -o - gammaln(int(m) + 1) + (m * np.log(o) if m > 0 else 0.0)
        rows.append({
            "bin": b, "observed": observed[b], "model": model[b],
            "obs_clamped": o, "model_clamped": m,
            "contribution": o * poi, "residual": observed[b] - model[b],
        })
    return rows


def print_likelihood_table(model, observed) -> float:
    rows = likelihood_table(model, observed)
    total = 0.0
    print(f"{'bin':>4} {'obs':>10} {'model':>12} {'contrib':>14} {'resid':>10}")
    for r in rows:
        total += r["contribution"]
        print(f"{r['bin']:>4} {r['observed']:>10.1f} {r['model']:>12.3f} "
              f"{r['contribution']:>14.2f} {r['residual']:>10.2f}")
    print(f"total log-likelihood: {total:.3f}")
    return total


def acceptance_report(chain) -> dict:
    """Mean/min/max acceptance fraction (PTSampler-style printout,
    ``tests/shiftingGaussian_brute.py:329-334``)."""
    acc = np.asarray(chain.acceptance_fraction)
    return {"mean": float(acc.mean()), "min": float(acc.min()),
            "max": float(acc.max()),
            "healthy": bool(0.1 < acc.mean() < 0.9)}


def integrated_autocorr_time(chain_1d, c: float = 5.0) -> float:
    """Sokal-style automatic-windowing IAT estimate for one parameter.

    chain_1d: (S, W) per-walker series; averages the autocorrelation over
    walkers (the emcee-v3 estimator's structure).
    """
    x = np.asarray(chain_1d, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    s, w = x.shape
    x = x - x.mean(axis=0)
    # FFT autocorrelation per walker; walkers with zero variance in the
    # window (no accepted move) carry no autocorrelation information
    n = 1 << (2 * s - 1).bit_length()
    f = np.fft.rfft(x, n=n, axis=0)
    acf = np.fft.irfft(f * np.conj(f), n=n, axis=0)[:s].real
    var = acf[0].copy()
    # relative threshold: FFT round-off leaves ~1e-29 "variance" on walkers
    # that never moved in the window
    moving = var > 1e-12 * max(var.max(), 1e-300)
    if not moving.any():
        return float(s)  # fully stuck: IAT at least the window length
    acf = acf[:, moving] / var[moving]
    rho = acf.mean(axis=1)
    taus = 2.0 * np.cumsum(rho) - 1.0
    window = np.arange(len(taus)) < c * taus
    if window.all():
        return float(taus[-1])
    m = int(np.argmin(window))
    return float(taus[m])


def gelman_rubin(chain) -> np.ndarray:
    """Split R-hat per parameter from an (S, W, D) chain."""
    x = np.asarray(chain, dtype=np.float64)
    s, w, d = x.shape
    half = s // 2
    segs = np.concatenate([x[:half], x[half: 2 * half]], axis=1)  # (half, 2W, D)
    m = segs.shape[1]
    means = segs.mean(axis=0)                # (2W, D)
    variances = segs.var(axis=0, ddof=1)     # (2W, D)
    between = half * means.var(axis=0, ddof=1)
    within = variances.mean(axis=0)
    var_est = (half - 1) / half * within + between / half
    return np.sqrt(var_est / within)


def effective_sample_size(chain) -> np.ndarray:
    """ESS per parameter: S*W / IAT."""
    x = np.asarray(chain)
    s, w, d = x.shape
    return np.array([s * w / max(integrated_autocorr_time(x[:, :, i]), 1.0)
                     for i in range(d)])
