"""Model families: unified forward model + historical driver presets."""

from . import (csi2016, fixed_params, forward, onebd, shifting_gaussian,
               simple, simult, templates)  # noqa: F401
from .forward import ForwardSpec, tof_spectra_multi, tof_spectrum  # noqa: F401
