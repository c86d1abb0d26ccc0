"""CLI driver: simultaneous multi-standoff fit (flagship #1).

TPU rebuild of ``python tests/simultFit.py`` (``tests/simultFit.py:42-63``
argparse surface).  Differences by design:

* ``-nThreads`` / ``-mpi`` are gone — walker parallelism is a sharded array
  axis over all visible devices (``--mesh`` to cap); no process pools.
* ``-datafile`` defaults to synthetic data generated at the reference's
  guess parameters instead of a hard-coded private home path
  (``tests/simultFit.py:47``); pass a real multistandoff TSV to fit data.
* chains stream to ``burninchain.dat`` / ``mainchain.dat`` in the
  emcee-compatible text format plus a ``.npz`` checkpoint for exact resume.

Run: ``python -m mcmctoffitting_tpu.cli.simult_fit -nRuns 4 -debug 1``
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-nRuns", choices=[1, 2, 3, 4, 5], default=4, type=int)
    p.add_argument("-debug", choices=[0, 1], default=0, type=int)
    p.add_argument("-datafile", default=None, type=str,
                   help="multistandoff TSV (default: synthesize)")
    p.add_argument("-quitEarly", choices=[0, 1], default=0, type=int)
    p.add_argument("-checkLikelihoodEval", choices=[0, 1], default=0,
                   type=int,
                   help="print the per-bin likelihood table + overlay/"
                        "residual figure at the guess point and exit (the "
                        "reference's checkLikelihoodEval debug helper, "
                        "tests/simultFit.py:474-512, wired to a flag)")
    p.add_argument("-batch", choices=[0, 1], default=0, type=int,
                   help="suppress plots")
    p.add_argument("-forceCustomPDF", choices=[0, 1], default=0, type=int,
                   help="accepted for surface parity; this build always "
                        "uses its own skew-normal (ops/pdfs.py), which IS "
                        "the reference's custom pdf (utilities/pdfs.py)")
    p.add_argument("-nDrawsPerEval", default=200_000, type=int)
    p.add_argument("-nBurninSteps", default=400, type=int)
    p.add_argument("-nMainSteps", default=100, type=int)
    p.add_argument("-nWalkers", default=256, type=int)
    p.add_argument("-outputPrefix", default="", type=str)
    p.add_argument("-seed", default=0, type=int)
    p.add_argument("-mesh", default=0, type=int,
                   help="max devices for walker sharding (0 = all)")
    p.add_argument("-chunkWalkers", default=0, type=int,
                   help="eval walkers in chunks of this size (memory cap)")
    p.add_argument("-segment", default=10, type=int,
                   help="steps per device->host chain flush")
    p.add_argument("-convergeMain", type=int, choices=[0, 1], nargs="?",
                   const=1, default=0,
                   help="treat -nMainSteps as a CAP and stop the main "
                        "phase early once S >= tauFactor * tau for every "
                        "parameter with a stable tau estimate (emcee's "
                        "convergence recipe; the reference hard-codes "
                        "chain lengths)")
    p.add_argument("-tauFactor", default=50.0, type=float,
                   help="chain-length multiple of the integrated "
                        "autocorrelation time required by -convergeMain")
    p.add_argument("-move", choices=["stretch", "de", "mixed"],
                   default="stretch",
                   help="ensemble proposal: emcee's stretch (default, "
                        "reference-faithful), differential evolution, or "
                        "an alternating mix (better ridge mixing)")
    p.add_argument("-resume", default="", type=str,
                   help="resume the MAIN phase from a .ckpt.npz checkpoint "
                        "(skips burn-in; exact continuation incl. PRNG)")
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
                        "sawtooth IS the dominant pseudo-marginal noise "
                        "(sigma~7e4 measured); poisson: correct Poisson "
                        "logpmf (sigma~2) — recommended for production")
    p.add_argument("-momentClosure", choices=["exact", "cell"],
                   default="exact",
                   help="counts/expected forward only — exact: full 4-row "
                        "ndtr partial-moment chain; cell: 2-row chain + "
                        "analytic within-cell closure for the t^2/t^3 "
                        "channels (error ~f32 rounding at F=1024, half "
                        "the transcendental cost; ops/e0grid.py)")
    p.add_argument("-fineGrid", default=0, type=int,
                   help="override the e0-preimage fine-grid size F "
                        "(default: per-mode — 256 mc / 1024 counts).  "
                        "Pure throughput/fidelity knob; the posterior-"
                        "level logp shift is <0.06 sigma for any "
                        "F >= 512 (RESULTS_r3.md)")
    p.add_argument("-nThreads", default=0, type=int,
                   help="accepted for surface parity and ignored: walker "
                        "parallelism is a device-mesh array axis here, not "
                        "a process pool (reference tests/simultFit.py:46)")
    p.add_argument("-mpi", default=0, type=int,
                   help="accepted for surface parity and ignored: the MPI "
                        "pool is replaced by jax.distributed + mesh "
                        "sharding (reference tests/simultFit.py:688-706)")
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

    import jax

    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)

    from ..models import simult
    from ..parallel import make_mesh, make_sharded_logp_batch
    from ..sampler import init_state, make_logp_batch
    from ..utils import chain_io, data_io
    from ._driver import load_resume_state, posterior_fingerprint, run_phases

    key = jax.random.PRNGKey(args.seed)
    # debug shrinks the ensemble unless -nWalkers was given explicitly
    n_walkers = (2 * 9 if args.debug and args.nWalkers == 256
                 else args.nWalkers)
    burnin_steps = 10 if args.debug else args.nBurninSteps
    main_steps = 10 if args.debug else args.nMainSteps
    n_draws = 5000 if args.debug else args.nDrawsPerEval

    sampling = "expected" if args.expectedForward else args.sampling
    spec = simult.default_spec(
        n_samples=n_draws,
        fine_grid=args.fineGrid or None,
        xs_mode="e0grid" if sampling != "mc" else args.gridMode,
        sampling=sampling)
    if args.momentClosure != "exact":
        import dataclasses
        spec = dataclasses.replace(spec, moment_closure=args.momentClosure)
    problem = simult.SimultFitProblem(spec, n_runs=args.nRuns,
                                      likelihood=args.likelihood)

    if args.datafile:
        tof_data = data_io.read_multi_standoff_tof_data(args.datafile,
                                                        args.nRuns)
        observed = tuple(
            data_io.select_window(tof_data, i, w.lo, w.hi)[0]
            for i, w in enumerate(problem.windows))
    else:
        truth = np.concatenate([simult.GUESS_SHARED,
                                np.full(args.nRuns, 5.0e4)])
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
        mesh = make_mesh(devices)
        logp_batch = make_sharded_logp_batch(logp, mesh, chunk=chunk)
        print(f"walker axis sharded over {len(devices)} devices")
    else:
        logp_batch = make_logp_batch(logp, chunk=chunk)

    prefix = args.outputPrefix
    burnin_path = prefix + "burninchain.dat"
    main_path = prefix + "mainchain.dat"
    fingerprint = posterior_fingerprint(problem, observed)
    if args.resume:
        state = load_resume_state(args.resume, problem, observed, logp_batch)
        print(f"resumed from {args.resume} at step {int(state.step)}")
        phases = (("main", main_path, main_steps, False),)
    else:
        p0 = problem.initial_walkers_from_observed(
            jax.random.fold_in(key, 1), n_walkers, observed)
        state = init_state(jax.random.fold_in(key, 2), p0, logp_batch)
        phases = (("burn-in", burnin_path, burnin_steps, True),
                  ("main", main_path, main_steps, True))

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
    # report quantiles over the main chain
    main_chain, _, n_params, _, _ = chain_io.read_chain_text(main_path)
    flat = main_chain.reshape(-1, n_params)
    q = np.percentile(flat, [16, 50, 84], axis=0)
    names = ["beamE", "eLoss", "scale", "s"] + [
        f"N{i + 1}" for i in range(args.nRuns)]
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
            trace_plot(main_chain, names,
                       prefix + "runSampleChainsOut.png")
        except Exception as e:  # matplotlib optional
            print(f"plotting skipped: {e}")
    return {"quantiles": result, "walker_steps_per_sec": rate}


if __name__ == "__main__":
    main()
