"""Model families: unified forward model + historical driver presets."""

from . import forward  # noqa: F401
