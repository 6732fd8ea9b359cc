"""Nonlinear optimizers (ref S10): on-device GN/LM/Dogleg while_loops."""

from .dogleg import DoglegConfig, dogleg_solve  # noqa: F401
from .lm import SolveStats, gn_solve, lm_solve, make_dense_solver  # noqa: F401
