"""Forward-model parity for the simple family (v0-v2.5) vs the
REFERENCE'S OWN generateModelData.

The early drivers (``tests/simpleTOFmodel.py``, ``tests/simpleTOFfit.py``,
``tests/intermediateTOFfit.py``, ``tests/intermediateTOFmodel.py``) are not
importable — they parse argv and launch fits at module level — so this tool
extracts their module constants + function definitions verbatim from the
AST (Import/Assign/FunctionDef nodes only; argparse, file reads, sampler
launches and plotting are bare-Expr/banned-call nodes and are skipped) and
executes the reference's own ``generateModelData`` directly.

Protocol (same shape as out/parity_onebd_*/forward_compare.json for the
flagships): at one physically-typical theta per family, average R
independent spectra per side, normalize over the reference's own TOF
window, and report L1 between the averaged spectra next to the
reference-side split-half MC floor.  PASS = L1 within 3x the floor
(lattice-resolution differences: the v2/v2.5 reference resamples through a
rint()-ed 100x150 (x, eD) histogram while this package keeps per-sample
values — the same sub-rint approximation class as the flagship e0grid
study, tests/test_e0grid.py).

Usage: JAX_PLATFORMS=cpu python tools/reference_forward_compare_simple.py
Writes out/forward_compare_simple/report.json and prints a table.
"""
from __future__ import annotations

import ast
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "out", "forward_compare_simple")
sys.path.insert(0, REPO)
sys.path.insert(0, REFERENCE)

N_DRAWS = 100_000
R_REPEATS = 12
BANNED_CALLS = {
    "ArgumentParser", "parse_args", "add_argument", "readMultiStandoffTOFdata",
    "EnsembleSampler", "PTSampler", "minimize", "genfromtxt", "loadtxt",
    "open", "show", "savefig", "figure", "subplots", "generateModelData",
    "histogram",  # module-level fake-data histogramming in v0/v2.5
}
BANNED_IMPORTS = {"emcee", "matplotlib", "pylab", "pymc3", "corner"}


def _has_banned_call(node) -> bool:
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call):
            f = sub.func
            name = f.id if isinstance(f, ast.Name) else (
                f.attr if isinstance(f, ast.Attribute) else "")
            if name in BANNED_CALLS:
                return True
    return False


def extract_driver(path: str, predefine=None) -> dict:
    """Exec the driver's imports, module constants and function defs
    (verbatim reference code) into a fresh namespace; skip argv parsing,
    IO, sampling and plotting statements."""
    src = open(path).read()
    tree = ast.parse(src)
    kept = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            mods = ([a.name for a in node.names] if isinstance(node, ast.Import)
                    else [node.module or ""])
            if any(m.split(".")[0] in BANNED_IMPORTS for m in mods):
                continue
            kept.append(node)
        elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            kept.append(node)
        elif isinstance(node, ast.Assign) and not _has_banned_call(node):
            kept.append(node)
    ns = dict(predefine or {})
    # the oneBD-era utilities call np.linspace with a float count; the
    # drivers' own numpy is modern — patch like reference_posterior_parity
    import utilities.utilities as ref_util
    orig_linspace = ref_util.np.linspace
    ref_util.np.linspace = lambda a, b, n, *args, **kw: orig_linspace(
        a, b, int(round(n)), *args, **kw)
    try:
        for node in kept:
            # driver-section leftovers (e.g. `samples = sampler.chain[...]`
            # after the skipped EnsembleSampler launch) reference skipped
            # state — drop them individually, keep everything that executes
            try:
                exec(compile(ast.Module(body=[node], type_ignores=[]),
                             path, "exec"), ns)
            except Exception:
                # any module statement that fails is driver-section residue
                # (references skipped argv/sampler/data state) — not needed
                # by the extracted kernels
                pass
    finally:
        ref_util.np.linspace = orig_linspace

    class _NpCompat:
        """Legacy-numpy shim for the reference code: histogram2d(normed=)
        was removed in modern numpy; map it to density= (the corrected
        semantics, which is what the reference relies on)."""

        def __init__(self, base):
            self._base = base

        def __getattr__(self, attr):
            return getattr(self._base, attr)

        def histogram2d(self, *args, **kw):
            if "normed" in kw:
                kw["density"] = kw.pop("normed")
            return self._base.histogram2d(*args, **kw)

    ns["np"] = _NpCompat(ns.get("np", np))
    return ns


def _norm(h):
    h = np.asarray(h, np.float64)
    s = h.sum()
    return h / s if s > 0 else h


def _compare(name, ref_spectra, our_spectra, theta):
    ref_mean = _norm(np.mean(ref_spectra, axis=0))
    our_mean = _norm(np.mean(our_spectra, axis=0))
    half = len(ref_spectra) // 2
    floor = np.abs(_norm(np.mean(ref_spectra[:half], axis=0))
                   - _norm(np.mean(ref_spectra[half:], axis=0))).sum()
    l1 = np.abs(ref_mean - our_mean).sum()
    row = {"model": name, "theta": list(map(float, theta)),
           "l1": float(l1), "mc_floor_l1": float(floor),
           "n_draws": N_DRAWS, "repeats": len(ref_spectra),
           "pass": bool(l1 < max(3.0 * floor, 0.01))}
    print(f"{name:6s} L1 = {l1:.4f}  (ref split-half floor {floor:.4f}) "
          f"-> {'PASS' if row['pass'] else 'FAIL'}")
    return row


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mcmctoffitting_tpu.constants import TUNL_SSA_CSI, TofWindow
    from mcmctoffitting_tpu.models.simple import SimpleSpec, model_pdf
    from mcmctoffitting_tpu.ops.stopping import d2_gas_stopping

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []

    def ours(spec, standoff, theta):
        f = jax.jit(lambda k: model_pdf(k, jnp.asarray(theta, jnp.float32),
                                        spec, standoff))
        return [np.asarray(f(jax.random.fold_in(key, i)))
                for i in range(R_REPEATS)]

    # ---- v0: shifting Gaussian, 3 params (tests/simpleTOFmodel.py) ----
    v0 = extract_driver(os.path.join(REFERENCE, "tests/simpleTOFmodel.py"))
    theta = (1100.0, -100.0, 50.0)
    ref = []
    for _ in range(R_REPEATS):
        np.random.seed(rng.integers(2**31))
        d = v0["generateModelData"](theta, N_DRAWS)
        h, _ = np.histogram(d[:, 3], v0["tof_nBins"], v0["tof_range"])
        ref.append(h)
    spec = SimpleSpec(window=TofWindow(v0["tof_minRange"],
                                       v0["tof_maxRange"], v0["tof_nBins"]),
                      poly_order=1, n_samples=N_DRAWS)
    rows.append(_compare("v0", ref,
                         ours(spec, TUNL_SSA_CSI.cell_to_zero, theta), theta))

    # ---- v1: cubic poly, 5 params (tests/simpleTOFfit.py) ----
    v1 = extract_driver(os.path.join(REFERENCE, "tests/simpleTOFfit.py"))
    theta = (900.0, -50.0, -10.0, -5.0, 60.0)
    ref = []
    for _ in range(R_REPEATS):
        np.random.seed(rng.integers(2**31))
        d = v1["generateModelData"](theta, v1["distance_standoffMid"],
                                    N_DRAWS)
        h, _ = np.histogram(d[:, 3], v1["tof_nBins"], v1["tof_range"])
        ref.append(h)
    spec = SimpleSpec(window=TofWindow(v1["tof_minRange"],
                                       v1["tof_maxRange"], v1["tof_nBins"]),
                      poly_order=3, add_half_zero_deg=True,
                      n_samples=N_DRAWS)
    assert abs(v1["distance_standoffMid"] - TUNL_SSA_CSI.standoff_mid) < 1e-9
    rows.append(_compare("v1", ref,
                         ours(spec, TUNL_SSA_CSI.standoff_mid, theta), theta))

    # ---- v2: + fractional sigma, XS weighting, beam conv ----
    v2 = extract_driver(os.path.join(REFERENCE,
                                     "tests/intermediateTOFfit.py"),
                        predefine={"runNumber": 0})
    theta = (900.0, -50.0, -10.0, -5.0, 0.05, 0.01)
    ref = []
    for _ in range(R_REPEATS):
        np.random.seed(rng.integers(2**31))
        raw = v2["generateModelData"](theta, v2["standoff"][0],
                                      v2["ddnXSinstance"], N_DRAWS, True)
        ref.append(v2["beamTiming"].applySpreading(raw))
    spec = SimpleSpec(window=TofWindow(v2["tof_minRange"],
                                       v2["tof_maxRange"], v2["tof_nBins"]),
                      poly_order=3, sigma_growth=True, xs_weighting=True,
                      convolve_beam=True, add_half_zero_deg=True,
                      n_samples=N_DRAWS)
    rows.append(_compare("v2", ref,
                         ours(spec, TUNL_SSA_CSI.standoff_mid, theta), theta))

    # ---- v2.5: Gaussian source + Bethe ODE transport ----
    # REFERENCE DEFECT (the 4th measured; see RESULTS_r3.md): the v2.5/v3
    # drivers pass meanExcitation = 19.2 — eV fed into the keV-unit Bethe
    # formula (tests/intermediateTOFmodel.py:94,
    # tests/advIntermediateTOFmodel.py:94).  At deuteron energies the
    # Bethe log then goes NEGATIVE and dEdx positive: their transported
    # deuterons GAIN energy with depth (897 -> 1002 keV over the cell,
    # measured).  The reference itself fixed the units later in
    # csi_oneBD (19.2 * 1e-3, tests/csi_oneBD.py:284).  This package uses
    # the correct 19.2 eV everywhere (ops/stopping.d2_gas_stopping), so
    # the comparison runs against the reference with csi_oneBD's
    # corrected excitation; the as-is defect is recorded alongside.
    v25 = extract_driver(os.path.join(REFERENCE,
                                      "tests/intermediateTOFmodel.py"),
                         predefine={"runNumber": 0})
    from utilities.ionStopping import ionStopping as ref_ion
    fixed_stopping = ref_ion.simpleBethe([1, 2, 8.37e-5, 1, 19.2e-3])
    from scipy.integrate import odeint
    probe = odeint(v25["stoppingModel"].dEdx,
                   np.full(8, 900.0), v25["x_binCenters"])
    rows.append({"model": "v2.5-reference-defect",
                 "note": "as-shipped meanExcitation=19.2 (eV value in keV "
                         "formula): transported energy GROWS "
                         f"{probe[0].mean():.0f} -> {probe[-1].mean():.0f} "
                         "keV over the cell (anti-physical); compare row "
                         "v2.5 uses csi_oneBD.py:284's corrected units",
                 "pass": None})
    print(f"v2.5 as-shipped reference transport: {probe[0].mean():.0f} -> "
          f"{probe[-1].mean():.0f} keV (energy GAIN; defect recorded)")

    theta = (900.0, 0.05)
    n25 = 50_000  # odeint per 10k-draw loop on the reference side is slow
    ref = []
    for _ in range(R_REPEATS):
        np.random.seed(rng.integers(2**31))
        raw = v25["generateModelData"](theta, v25["standoff"][0],
                                       v25["ddnXSinstance"],
                                       fixed_stopping.dEdx, n25, True)
        ref.append(v25["beamTiming"].applySpreading(raw))
    spec = SimpleSpec(window=TofWindow(v25["tof_minRange"],
                                       v25["tof_maxRange"],
                                       v25["tof_nBins"]),
                      poly_order=0, bethe_transport=True,
                      stopping=d2_gas_stopping(rho=8.37e-5),  # :92
                      xs_weighting=True,
                      convolve_beam=True, add_half_zero_deg=True,
                      n_samples=n25)
    rows.append(_compare("v2.5", ref,
                         ours(spec, TUNL_SSA_CSI.standoff_mid, theta),
                         theta))

    # ---- template family: one monoenergetic slice, mid standoff ----
    # (tests/devShapeTemplates.py:195-245; its generateModelData applies
    # beamTiming spreading internally and uses the CORRECTED excitation
    # units, :102)
    tpl = extract_driver(os.path.join(REFERENCE,
                                      "tests/devShapeTemplates.py"),
                         predefine={"runNumber": 0})
    from mcmctoffitting_tpu.models import templates as our_tpl
    slice_idx = 16  # 800-825 keV
    e_lo = float(tpl["templateEnergyBounds"][slice_idx])
    e_hi = float(tpl["templateEnergyBounds"][slice_idx + 1])
    # the driver's nEvPerLoop is 200k: any smaller nSamples runs ZERO
    # MC loops (int(n/200000) == 0) and yields an empty template
    n_tpl = 200_000
    ref = []
    for _ in range(6):
        np.random.seed(rng.integers(2**31))
        ref.append(tpl["generateModelData"](
            [e_lo, e_hi], tpl["standoffs"][0], tpl["tof_nBins"]["mid"],
            (tpl["tof_minRange"][0], tpl["tof_maxRange"][0]),
            tpl["ddnXSinstance"], tpl["stoppingModel"].dEdx, n_tpl, True))
    tspec = our_tpl.default_spec(n_samples=n_tpl)
    from mcmctoffitting_tpu.constants import tof_windows
    win = tof_windows["mid"]
    f = jax.jit(lambda k: our_tpl.template_spectrum(
        k, e_lo, e_hi, tspec, TUNL_SSA_CSI.standoff_mid, win))
    ours_tpl = [np.asarray(f(jax.random.fold_in(key, i)))
                for i in range(6)]
    rows.append(_compare("tmpl", ref, ours_tpl, (e_lo, e_hi)))

    with open(os.path.join(OUT, "report.json"), "w") as f:
        json.dump({"rows": rows, "protocol":
                   "averaged normalized spectra, R repeats per side, "
                   "L1 vs reference split-half MC floor"}, f, indent=1)
    print(f"report -> {os.path.join(OUT, 'report.json')}")
    if not all(r["pass"] for r in rows if r["pass"] is not None):
        sys.exit(1)


if __name__ == "__main__":
    main()
