"""Native ensemble samplers (stretch move, parallel tempering)."""

from .stretch import (Chain, EnsembleState, init_state, make_logp_batch,
                      make_step, run_mcmc, sample)  # noqa: F401
