"""CLI driver: chain diagnostics from a file.

Rebuild of ``python tests/plotChainFromFile.py`` and
``utilities/plotChains_oneBD.py`` / ``plotChains_templateFitting.py``:
trace plots, lnprob-vs-parameter scatter, marginal histograms, and a corner
plot from an emcee-text-format chain file.

Run: ``python -m mcmctoffitting_tpu.cli.plot_chain -filename mainchain.dat``
"""
from __future__ import annotations

import argparse


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-filename", required=True, type=str)
    p.add_argument("-outputPrefix", default="chain_", type=str)
    p.add_argument("-nStepsToInclude", default=50, type=int)
    p.add_argument("-paramNames", default=None, type=str,
                   help="comma-separated names")
    args = p.parse_args(argv)

    from ..utils import chain_io
    from ..utils.plotting import (corner_plot, lnprob_scatter, param_hist,
                                  trace_plot)

    import os
    import sys
    if not os.path.exists(args.filename):
        sys.exit(f"error: chain file not found: {args.filename}")
    try:
        chain, probs, n_params, n_walkers, n_steps = \
            chain_io.read_chain_text(args.filename)
    except Exception as e:
        sys.exit(f"error: could not parse chain file {args.filename}: {e}")
    print(f"chain: {n_steps} steps x {n_walkers} walkers x {n_params} params")
    names = args.paramNames.split(",") if args.paramNames else None

    summary = None
    if n_steps >= 8:
        from ..utils.diagnostics import chain_summary, format_summary
        summary = chain_summary(chain)
        print(format_summary(summary))
        per = "  ".join(f"p{d}: tau={summary['tau'][d]:.1f} "
                        f"ess={summary['ess'][d]:.0f} "
                        f"rhat={summary['rhat'][d]:.3f}"
                        for d in range(n_params))
        print(per)

    trace_plot(chain, names, args.outputPrefix + "trace.png")
    for d in range(n_params):
        lnprob_scatter(chain, probs, d,
                       names[d] if names else None,
                       f"{args.outputPrefix}lnprob_vs_p{d}.png")
        param_hist(chain, d, filename=f"{args.outputPrefix}hist_p{d}.png")
    corner_plot(chain[-args.nStepsToInclude:], names,
                filename=args.outputPrefix + "corner.png")
    print(f"wrote plots with prefix {args.outputPrefix}")
    return {"n_steps": n_steps, "n_walkers": n_walkers,
            "n_params": n_params}


if __name__ == "__main__":
    main()
