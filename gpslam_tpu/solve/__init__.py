"""Nonlinear optimizers (ref S10): on-device GN/LM/Dogleg while_loops +
automatic backend selection."""

from .auto import auto_solver  # noqa: F401
from .dogleg import DoglegConfig, dogleg_solve  # noqa: F401
from .lm import SolveStats, gn_solve, lm_solve, make_dense_solver  # noqa: F401
