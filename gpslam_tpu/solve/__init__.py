"""Nonlinear optimizers (ref S10): on-device GN/LM while_loops."""

from .lm import SolveStats, gn_solve, lm_solve, make_dense_solver  # noqa: F401
