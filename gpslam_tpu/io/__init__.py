"""Dataset generation and loading (ref G12/L8)."""

from . import synthetic  # noqa: F401
