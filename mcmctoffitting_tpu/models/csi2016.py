"""The ppcTools-era CsI-2016 campaign model (skew-normal beam source).

Old-campaign chains are parameterized theta = (e0, sigma0, skew0,
scaleFactor): the beam energy distribution is drawn directly from a
skew-normal, ``eZeros = skewnorm.rvs(a=skew0, loc=e0, scale=e0*sigma0)``
with a plain-normal fallback (``utilities/ppcTools.py:197-217``,
``generateModelData_original``).  This preset makes those chains
representable through the unified forward model so posterior-predictive
checks work on skewnorm-era chain files (``cli/ppc.py -model csi2016``).

Geometry/windows/standoffs match ``utilities/ppcTools.py:81-103`` (the
same 2016 CsI campaign as simultFit); binning matches the ppcTools
defaults ``nBins_eD=100, nBins_x=20`` (``utilities/ppcTools.py:31-55``).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import Binning
from ..constants import TUNL_SSA_CSI, TofWindow, tof_windows
from ..ops.stopping import d2_gas_stopping
from ..ops.timing import ExGaussianTiming
from .forward import ForwardSpec, tof_spectrum
from .simult import RUN_LAYOUT


def default_spec(n_samples: int = 50_000) -> ForwardSpec:
    """Forward spec for ppcTools-era chains (skewnorm source, ODE path)."""
    return ForwardSpec(
        geometry=TUNL_SSA_CSI,
        ed_binning=Binning(200.0, 1200.0, 100),
        x_binning=Binning(0.0, TUNL_SSA_CSI.cell_length, 20),
        stopping=d2_gas_stopping(rho=8.565e-5),
        transport="rk4",
        rk4_substeps=1,
        beam_timing=ExGaussianTiming(),
        zero_degree="segments",
        cell_attenuation=False,
        beam_source="skewnorm",
        n_samples=n_samples,
        histogram_chunk=4096,
    )


@dataclasses.dataclass(frozen=True)
class Csi2016Problem:
    """Static problem wrapper for PPC on old-campaign chains.

    theta = (e0, sigma0, skew0, scaleFactor); ONE shared scale factor
    across runs (``utilities/ppcTools.py:207``), unlike simultFit's
    per-run normalizations.
    """

    spec: ForwardSpec
    n_runs: int = 4

    @property
    def standoffs(self) -> tuple[float, ...]:
        g = self.spec.geometry
        return tuple(g.standoff(name) for name in RUN_LAYOUT[: self.n_runs])

    @property
    def windows(self) -> tuple[TofWindow, ...]:
        return tuple(tof_windows[name] for name in RUN_LAYOUT[: self.n_runs])

    @property
    def n_dim(self) -> int:
        return 4

    def shared_params(self, theta):
        """(e0, sigma0, skew0, scaleFactor); traceable."""
        return jnp.asarray(theta)[..., :4]

    def run_spectrum(self, key, theta, run: int, *, get_pdf: bool = True):
        """Model spectrum for one run (generateModelData_original
        equivalent, ``utilities/ppcTools.py:197-281``)."""
        return tof_spectrum(key, theta[:4], self.spec, self.standoffs[run],
                            self.windows[run], get_pdf=get_pdf,
                            scale=theta[3])
