"""Host-side utilities: chain IO, data IO, PPC, plotting."""

from . import chain_io, data_io  # noqa: F401
