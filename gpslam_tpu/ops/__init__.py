"""Linear-algebra backends (ref S6-S9): dense, block-tridiag scan, Schur."""

from . import dense  # noqa: F401
