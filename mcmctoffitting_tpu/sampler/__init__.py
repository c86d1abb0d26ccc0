"""Native ensemble samplers (stretch move, parallel tempering)."""

from .stretch import (Chain, EnsembleState, init_state, make_logp_batch,
                      make_step, run_mcmc, sample)  # noqa: F401
from .pt import PTChain, default_beta_ladder, sample_pt  # noqa: F401
from .hmc import hmc_sample, metropolis_sample  # noqa: F401
from .nuts import NUTSChain, nuts_sample  # noqa: F401
