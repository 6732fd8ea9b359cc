"""Solver configuration dataclasses (reference: GTSAM parameter structs,
SURVEY.md §5.6 — names kept close to GTSAM's for chi^2-parity debugging).

All configs are frozen/hashable so they can be closed over by jit.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """LevenbergMarquardtParams equivalent.

    GTSAM defaults: lambdaInitial=1e-5, lambdaFactor=10, lambdaUpperBound=1e5,
    maxIterations=100, {relative,absolute}ErrorTol=1e-5.
    """

    max_iterations: int = 100
    lambda_init: float = 1e-5
    lambda_factor: float = 10.0
    lambda_max: float = 1e5
    lambda_min: float = 1e-10
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    diagonal_damping: bool = False


@dataclasses.dataclass(frozen=True)
class GNConfig:
    """GaussNewtonParams equivalent (undamped; fixed-point iteration)."""

    max_iterations: int = 20
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
