"""Measure the reference's lnprob throughput on CPU -> BASELINE_MEASURED.json.

The reference publishes no benchmark numbers (BASELINE.md), so per the
BASELINE.md protocol we measure it ourselves: time one full simultFit-style
lnprob evaluation — 4 standoff runs x (200k lognorm draws + vector dopri5
Bethe transport over 10 x-bins + XS-weighted histograms + the (x, eD)
ndenumerate TOF-synthesis loop + exGaussian convolution + per-bin Poisson
log-likelihood) — using the REFERENCE'S OWN physics kernels imported from
/root/reference (ddnXSinterpolator, beamTimingShape, zeroDegreeTimingSpread,
ionStopping.simpleBethe), orchestrated exactly as tests/simultFit.py's
generateModelData/lnlike do (same array ops, same per-cell Python loop).
emcee is not installed here, but emcee's sampler overhead is negligible
next to lnprob, so walker-steps/sec == lnprob evals/sec x threads.

Writes: BASELINE_MEASURED.json {t_lnprob_s, walker_steps_per_sec_1thread,
walker_steps_per_sec_3threads, methodology}.

Run once on the target machine:  python tools/measure_reference_baseline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

N_DRAWS = 200_000
N_EV_PER_LOOP = 50_000
N_RUNS = 4


def reference_lnprob_once(ref) -> float:
    """One lnprob evaluation orchestrated like tests/simultFit.py:223-300,
    380-420, calling the reference's own kernel objects."""
    from scipy.integrate import ode
    from scipy.special import gammaln
    from scipy.stats import lognorm

    consts = ref["constants"]
    distances, masses = consts.distances, consts.masses
    tofW = consts.tofWindows()

    ddnXS = ref["utilities"].ddnXSinterpolator()
    # numpy-compat shim: the reference passes a float bin count to
    # np.linspace (utilities/utilities.py:249-254), which modern numpy
    # rejects; coerce to int while constructing the timing object
    ref_np = ref["utilities"].np
    orig_linspace = ref_np.linspace
    ref_np.linspace = lambda a, b, n, *args, **kw: orig_linspace(
        a, b, int(n), *args, **kw)
    try:
        beamTiming = ref["utilities"].beamTimingShape()
    finally:
        ref_np.linspace = orig_linspace
    zeroDeg = ref["utilities"].zeroDegreeTimingSpread()
    stopping = ref["ionStopping"].ionStopping.simpleBethe([1])
    stopping.addMaterial([1, 2, 8.565e-5, 19.2e-3])
    getTOF = ref["utilities"].getTOF
    getDDn = ref["utilities"].getDDneutronEnergy

    eD_bins, eD_lo, eD_hi = 50, 200.0, 1200.0
    x_bins = 10
    L = distances.tunlSSA_CsI.cellLength
    x_centers = np.linspace(L / 20, L - L / 20, x_bins)
    eD_centers = np.linspace(eD_lo + 10, eD_hi - 10, eD_bins)
    eN_centers = getDDn(eD_centers)
    eD_binSize, x_binSize = (eD_hi - eD_lo) / eD_bins, L / x_bins

    standoffs = [distances.tunlSSA_CsI.standoffMid,
                 distances.tunlSSA_CsI.standoffClose,
                 distances.tunlSSA_CsI.standoffClose,
                 distances.tunlSSA_CsI.standoffFar][:N_RUNS]
    windows = [("mid",), ("close",), ("close",), ("far",)][:N_RUNS]

    theta = (1878.4, 850.0, 170.0, 0.5)
    rng_obs = np.random.default_rng(0)

    total = 0.0
    for run in range(N_RUNS):
        name = windows[run][0]
        lo, hi = tofW.minRange[name], tofW.maxRange[name]
        nb = tofW.nBins[name]
        observed = rng_obs.poisson(200.0, nb).astype(float)

        data_hist = np.zeros((x_bins, eD_bins))
        n_loops = int(np.ceil(N_DRAWS / N_EV_PER_LOOP))
        for _ in range(n_loops):
            ez = np.repeat(theta[0], N_EV_PER_LOOP) - lognorm.rvs(
                s=theta[3], loc=theta[1], scale=theta[2],
                size=N_EV_PER_LOOP)
            while True:
                bad = np.where(ez <= 0.0)[0]
                if bad.size == 0:
                    break
                ez[bad] = theta[0] - lognorm.rvs(
                    s=theta[3], loc=theta[1], scale=theta[2], size=bad.size)
            solver = ode(lambda x, y: stopping.dEdx(energy=y, x=x))
            solver.set_integrator("dopri5").set_initial_value(ez)
            for i, x in enumerate(x_centers):
                sol = solver.integrate(x)
                w = ddnXS.evaluate(sol)
                h, _ = np.histogram(sol, eD_bins, (eD_lo, eD_hi), weights=w)
                data_hist[i] += h
        data_hist /= np.sum(data_hist * eD_binSize * x_binSize)
        e0mean = float(np.mean(ez))
        draw2d = np.rint(data_hist * N_DRAWS).astype(int)
        tofs, tofWs = [], []
        for idx, weight in np.ndenumerate(draw2d):
            cell = x_centers[idx[0]]
            eff = (e0mean + eD_centers[idx[1]]) / 2
            tof_d = getTOF(masses.deuteron, eff, cell)
            ndist = L - cell + standoffs[run]
            tof_n = getTOF(masses.neutron, eN_centers[idx[1]], ndist)
            zt, zw = zeroDeg.getTimesAndWeights(eN_centers[idx[1]])
            tofs.append(tof_d + tof_n + zt)
            tofWs.append(weight * zw)
        tof_hist, _ = np.histogram(tofs, nb, (lo, hi), weights=tofWs,
                                   density=True)
        model = 1.0e4 * beamTiming.applySpreading(tof_hist)

        ll = 0.0
        for b in range(nb):
            o = observed[b] if observed[b] != 0 else 1.0
            m = model[b] if model[b] != 0 else 1.0
            p = -o - gammaln(int(m) + 1)
            if m > 0:
                p += m * np.log(o)
            ll += o * p
        total += ll
    return total


def main() -> None:
    if not os.path.isdir(REFERENCE):
        print("reference tree not available; skipping")
        return
    sys.path.insert(0, REFERENCE)
    import importlib
    ref = {
        "constants": importlib.import_module("constants.constants"),
        "utilities": importlib.import_module("utilities.utilities"),
        "ionStopping": importlib.import_module("utilities.ionStopping"),
    }

    # warm-up (spline builds etc.), then timed evals
    t0 = time.perf_counter()
    reference_lnprob_once(ref)
    warm = time.perf_counter() - t0

    n_evals = 2
    t0 = time.perf_counter()
    for _ in range(n_evals):
        reference_lnprob_once(ref)
    t_lnprob = (time.perf_counter() - t0) / n_evals

    out = {
        "t_lnprob_s": round(t_lnprob, 3),
        "t_warmup_s": round(warm, 3),
        "walker_steps_per_sec_1thread": round(1.0 / t_lnprob, 4),
        "walker_steps_per_sec_3threads": round(3.0 / t_lnprob, 4),
        "config": {"n_draws": N_DRAWS, "n_runs": N_RUNS,
                   "nEvPerLoop": N_EV_PER_LOOP},
        "machine": os.uname().nodename,
        "methodology": (
            "one simultFit lnprob (4 runs x 200k draws) timed on CPU using "
            "the reference's own kernels imported from /root/reference, "
            "orchestrated as tests/simultFit.py:223-300,380-420; "
            "walker-steps/sec = threads / t_lnprob (emcee overhead "
            "negligible); x3 for the driver's default -nThreads 3"),
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
