"""Physics/compute kernels (pure jnp + Pallas; no host round-trips)."""

from . import (histogram, interp, kinematics, likelihoods, pdfs, stopping,
               timing, xs)  # noqa: F401
