"""Utilities: derivative checks (S13), profiling (§5.1), diagnostics (§5.3),
metrics (§5.5)."""

from . import checks, diagnostics, metrics, profiling  # noqa: F401
