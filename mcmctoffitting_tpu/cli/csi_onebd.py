"""CLI driver: csi_oneBD fit (flagship #2).

TPU rebuild of ``python tests/csi_oneBD.py`` (``tests/csi_oneBD.py:58-76``
argparse surface): fixed beam reference energy, per-run scale + Poisson
background, spline-table stopping, cell attenuation, -qnd/-quickish/
-hardcore sampling presets, -shiftTOF systematic.  Threads/MPI flags are
replaced by device-mesh walker sharding.

Run: ``python -m mcmctoffitting_tpu.cli.csi_onebd -debug 1``
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-run", choices=[0, 1, 2, 3], default=0, type=int,
                   help="accepted for surface parity; vestigial in the "
                        "reference (its window selection is immediately "
                        "overwritten, tests/csi_oneBD.py:178-183)")
    p.add_argument("-inputDataFilename", default=None, type=str)
    p.add_argument("-debug", choices=[0, 1], default=0, type=int)
    p.add_argument("-forceCustomPDF", choices=[0, 1], default=0, type=int,
                   help="accepted for surface parity; this build always "
                        "uses its own skew-normal (ops/pdfs.py), which IS "
                        "the reference's custom pdf (utilities/pdfs.py)")
    p.add_argument("-quitEarly", choices=[0, 1], default=0, type=int)
    p.add_argument("-checkLikelihoodEval", choices=[0, 1], default=0,
                   type=int,
                   help="print the per-bin likelihood table + overlay/"
                        "residual figure at the guess point and exit (the "
                        "reference's checkLikelihoodEval debug helper, "
                        "tests/csi_oneBD.py:654-712, wired to a flag)")
    p.add_argument("-batch", choices=[0, 1], default=0, type=int)
    p.add_argument("-nDrawsPerEval", default=200_000, type=int)
    p.add_argument("-nBurninSteps", default=400, type=int)
    p.add_argument("-nMainSteps", default=100, type=int)
    p.add_argument("-outputPrefix", default="", type=str)
    p.add_argument("-nWalkers", default=256, type=int)
    # the reference spells these as int choices (-qnd 1,
    # tests/csi_oneBD.py:71-73); accept both that and bare-flag style
    p.add_argument("-qnd", type=int, choices=[0, 1], nargs="?", const=1,
                   default=0, help="quick and dirty: 60k draws")
    p.add_argument("-quickish", type=int, choices=[0, 1], nargs="?",
                   const=1, default=0, help="100k draws")
    p.add_argument("-hardcore", type=int, choices=[0, 1], nargs="?",
                   const=1, default=0, help="400 eD x 20 x binning")
    p.add_argument("-shiftTOF", default=0, type=int,
                   help="shift observed spectra by whole bins (systematic)")
    p.add_argument("-seed", default=0, type=int)
    p.add_argument("-mesh", default=0, type=int)
    p.add_argument("-chunkWalkers", default=0, type=int)
    p.add_argument("-segment", default=10, type=int)
    p.add_argument("-convergeMain", type=int, choices=[0, 1], nargs="?",
                   const=1, default=0,
                   help="treat -nMainSteps as a CAP and stop the main "
                        "phase early once S >= tauFactor * tau for every "
                        "parameter with a stable tau estimate")
    p.add_argument("-tauFactor", default=50.0, type=float)
    p.add_argument("-move", choices=["stretch", "de", "mixed"],
                   default="stretch",
                   help="ensemble proposal: stretch (reference-faithful), "
                        "differential evolution, or an alternating mix")
    p.add_argument("-resume", default="", type=str,
                   help="resume the MAIN phase from a .ckpt.npz checkpoint "
                        "(skips burn-in; exact continuation incl. PRNG)")
    p.add_argument("-deterministicBG", action="store_true",
                   help="add the expected background level instead of a "
                        "fresh Poisson draw per eval (statistically clean; "
                        "default is the reference-faithful pseudo-marginal "
                        "draw, tests/csi_oneBD.py:521)")
    p.add_argument("-gridMode", choices=["e0grid", "taylor"],
                   default="e0grid",
                   help="e0grid (default): static e0-space preimage grid "
                        "(fast; sub-rint approximation, ops/e0grid.py); "
                        "taylor: per-sample transport + per-slice moments")
    p.add_argument("-expectedForward", action="store_true",
                   help="closed-form expected forward model (the exact "
                        "infinite-draw limit; no pseudo-marginal noise); "
                        "alias for -sampling expected")
    p.add_argument("-sampling", choices=["mc", "counts", "expected"],
                   default="mc",
                   help="mc: faithful per-sample Monte Carlo (reference "
                        "semantics); counts: Poissonized Rao-Blackwell MC "
                        "— same unbiased estimator at equal-or-lower "
                        "per-eval noise, O(F) cost (recommended for "
                        "production MC); expected: closed-form limit")
    p.add_argument("-likelihood", choices=["reference", "poisson"],
                   default="reference",
                   help="reference: the faithful int()-cast form, whose "
                        "sawtooth IS the dominant pseudo-marginal noise; "
                        "poisson: correct Poisson logpmf — recommended")
    p.add_argument("-momentClosure", choices=["exact", "cell"],
                   default="exact",
                   help="counts/expected forward only — exact: full 4-row "
                        "ndtr partial-moment chain; cell: 2-row chain + "
                        "analytic within-cell closure for the t^2/t^3 "
                        "channels (error ~f32 rounding at F=2048, half "
                        "the transcendental cost; ops/e0grid.py)")
    p.add_argument("-fineGrid", default=0, type=int,
                   help="override the e0-preimage fine-grid size F "
                        "(default: per-mode — 512 mc / 1024 hardcore / "
                        "2048 counts).  Pure throughput/fidelity knob; "
                        "the posterior-level logp shift is <0.06 sigma "
                        "for any F >= 512 (RESULTS_r3.md)")
    p.add_argument("-nThreads", default=0, type=int,
                   help="accepted for surface parity and ignored: walker "
                        "parallelism is a device-mesh array axis here, not "
                        "a process pool (reference tests/csi_oneBD.py:62)")
    p.add_argument("-mpi", default=0, type=int,
                   help="accepted for surface parity and ignored: the MPI "
                        "pool is replaced by jax.distributed + mesh "
                        "sharding (reference tests/csi_oneBD.py:61)")
    p.add_argument("-profile", default="", type=str, metavar="DIR",
                   help="capture a jax.profiler device trace of the "
                        "sampling phases into DIR (TensorBoard-compatible; "
                        "utils/profiling.py).  The reference has no "
                        "profiler at all (SURVEY.md §5)")
    p.add_argument("-prng", choices=["threefry2x32", "rbg"], default=None,
                   help="PRNG implementation (default: jax's). rbg uses "
                        "the TPU's hardware generator; every sampler in "
                        "the package is impl-agnostic (ops/poisson.py "
                        "replaces the threefry-only jax.random.poisson). "
                        "Changes draw streams, not distributions.")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from ._driver import enable_compile_cache
    enable_compile_cache()

    import dataclasses

    import jax

    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)

    from ..models import onebd
    from ..parallel import make_mesh, make_sharded_logp_batch
    from ..sampler import init_state, make_logp_batch
    from ..utils import chain_io, data_io
    from ._driver import load_resume_state, posterior_fingerprint, run_phases

    key = jax.random.PRNGKey(args.seed)
    n_draws = args.nDrawsPerEval
    if args.quickish:
        n_draws = 100_000
    if args.qnd:
        n_draws = 60_000
    if args.debug:
        n_draws = 5000
    # debug shrinks the ensemble unless -nWalkers was given explicitly
    n_walkers = (2 * 9 if args.debug and args.nWalkers == 256
                 else args.nWalkers)
    burnin_steps = 10 if args.debug else args.nBurninSteps
    main_steps = 10 if args.debug else args.nMainSteps

    sampling = "expected" if args.expectedForward else args.sampling
    spec = onebd.default_spec(
        n_samples=n_draws, hardcore=args.hardcore,
        fine_grid=args.fineGrid or None,
        xs_mode="e0grid" if sampling != "mc" else args.gridMode,
        sampling=sampling)
    if args.deterministicBG:
        spec = dataclasses.replace(spec, bg_mode="expected")
    if args.momentClosure != "exact":
        spec = dataclasses.replace(spec, moment_closure=args.momentClosure)
    problem = onebd.OneBDProblem(spec, n_runs=3,
                                 likelihood=args.likelihood)

    if args.inputDataFilename:
        tof_data = data_io.read_multi_standoff_tof_data(
            args.inputDataFilename, 3)
        # -shiftTOF relabels the count rows against the time axis by whole
        # bins BEFORE window selection (tests/csi_oneBD.py:698-706)
        shift = args.shiftTOF
        if shift > 0:
            edges = tof_data[:-shift, 0]
            tof_data = tof_data[shift:].copy()
            tof_data[:, 0] = edges
        elif shift < 0:
            edges = tof_data[-shift:, 0]
            tof_data = tof_data[:shift].copy()
            tof_data[:, 0] = edges
        observed = tuple(
            data_io.select_window(tof_data, i, w.lo, w.hi)[0]
            for i, w in enumerate(problem.windows))
    else:
        truth = np.array([1300.0, 80.0, 0.6, 5e4, 5e4, 5e4,
                          20.0, 20.0, 20.0])
        observed = data_io.synthesize_observed(
            jax.random.fold_in(key, 99), problem, truth)
        print("using synthetic observed data at guess parameters")

    if args.quitEarly:
        print("quitEarly: setup complete")
        return {"status": "quitEarly"}

    if args.checkLikelihoodEval:
        from ._driver import check_likelihood_eval
        total = check_likelihood_eval(problem, observed,
                                      jax.random.fold_in(key, 3),
                                      prefix=args.outputPrefix,
                                      batch=bool(args.batch))
        return {"status": "checkLikelihoodEval", "total_loglike": total}

    logp = problem.make_log_prob_fn(observed)
    devices = jax.devices()
    if args.mesh:
        devices = devices[: args.mesh]
    chunk = args.chunkWalkers or None
    if len(devices) > 1:
        logp_batch = make_sharded_logp_batch(logp, make_mesh(devices),
                                             chunk=chunk)
        print(f"walker axis sharded over {len(devices)} devices")
    else:
        logp_batch = make_logp_batch(logp, chunk=chunk)

    prefix = args.outputPrefix
    fingerprint = posterior_fingerprint(problem, observed)
    if args.resume:
        state = load_resume_state(args.resume, problem, observed, logp_batch)
        print(f"resumed from {args.resume} at step {int(state.step)}")
        phases = (("main", prefix + "mainchain.dat", main_steps, False),)
    else:
        p0 = problem.initial_walkers_from_observed(
            jax.random.fold_in(key, 1), n_walkers, observed)
        state = init_state(jax.random.fold_in(key, 2), p0, logp_batch)
        phases = (("burn-in", prefix + "burninchain.dat", burnin_steps, True),
                  ("main", prefix + "mainchain.dat", main_steps, True))

    import contextlib

    from ..utils import profiling
    prof = (profiling.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        state, total_steps, elapsed = run_phases(
            state, phases, logp_batch, n_walkers=n_walkers,
            segment=args.segment, prefix=prefix, fingerprint=fingerprint,
            adaptive_phase="main" if args.convergeMain else None,
            tau_factor=args.tauFactor, move=args.move)
    if args.profile:
        print(f"profiler trace written to {args.profile}")

    main_chain, _, n_params, _, _ = chain_io.read_chain_text(
        prefix + "mainchain.dat")
    flat = main_chain.reshape(-1, n_params)
    q = np.percentile(flat, [16, 50, 84], axis=0)
    names = (["eLoss", "scale", "s"] + [f"N{i+1}" for i in range(3)]
             + [f"BG{i+1}" for i in range(3)])
    print("MCMC result (median +sigma -sigma):")
    result = {}
    for d, name in enumerate(names):
        med, lo, hi = q[1, d], q[1, d] - q[0, d], q[2, d] - q[1, d]
        print(f"  {name} = {med:.4g} +{hi:.3g} -{lo:.3g}")
        result[name] = [float(med), float(hi), float(lo)]

    rate = total_steps * int(state.positions.shape[0]) / elapsed
    print(json.dumps({"walker_steps_per_sec": rate, "elapsed_s": elapsed}))

    if not args.batch:
        try:
            from ..utils.plotting import trace_plot
            trace_plot(main_chain, names, prefix + "runSampleChainsOut.png")
        except Exception as e:
            print(f"plotting skipped: {e}")
    return {"quantiles": result, "walker_steps_per_sec": rate}


if __name__ == "__main__":
    main()
