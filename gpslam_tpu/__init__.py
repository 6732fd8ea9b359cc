"""gpslam_tpu — TPU-native continuous-time GP-SLAM engine.

A brand-new JAX/XLA/Pallas probabilistic inference engine for the model class
of the reference `gtrll/gpslam` (see SURVEY.md): continuous-time trajectories
under sparse Gaussian-process priors (LTI-SDE; white-noise-on-acceleration
and white-noise-on-jerk) on vector spaces and the Lie groups SE(2)/SE(3),
with range / odometry / landmark measurement factors (including
GP-interpolated factors at arbitrary measurement times), solved by MAP
inference (Gauss-Newton / Levenberg-Marquardt / Dogleg over
structure-exploiting block solvers) plus Laplace-style marginal covariances
and a fixed-lag incremental smoother.

Layer map (TPU-native restack of SURVEY.md §1):
  lie/       batched SO(2)/SE(2)/SO(3)/SE(3) Exp/Log/Jacobians   (ref L2)
  gp/        WNOA/WNOJ closed forms: Phi, Q, Qinv, Lambda, Psi    (ref G2)
  factors/   vmapped per-factor-type residual+Jacobian kernels    (ref G3-G9, S4)
  graph/     typed factor tables (SoA) + Values pytree            (ref S5)
  ops/       assembly, BCR chain solver, supernodal Cholesky,
             PCG, Pallas kernels, host-side ordering              (ref S6-S9)
  solve/     on-device GN/LM/Dogleg while_loops                   (ref S10)
  smoother   fixed-lag sliding window                             (ref S11)
  marginals  selected-inverse covariances                         (ref S12)
  parallel/  mesh, factor/time sharding, multiseed vmap           (ref §2.4)
  io/        dataset generators + g2o/TORO/Plaza loaders          (ref G12)
  utils/     derivative checks, profiling, diagnostics, metrics   (ref S13/S16/§5)
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("GPSLAM_TPU_NO_PRECISION_OVERRIDE"):
    # A nonlinear least-squares SOLVER cannot tolerate the TPU MXU's default
    # bf16 matmul passes: with the default, f32 3x3 pose products carry ~1e-3
    # error and LM stops converging (measured on v5e). Pin full-f32 matmul
    # precision process-wide; opt out via GPSLAM_TPU_NO_PRECISION_OVERRIDE=1
    # if embedding this library alongside throughput-critical bf16 ML code.
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")

# convenience top-level API
from .config import GNConfig, LMConfig  # noqa: E402,F401
from .solve import (  # noqa: E402,F401
    DoglegConfig,
    SolveStats,
    dogleg_solve,
    gn_solve,
    lm_solve,
    make_dense_solver,
)
from .graph import GraphBuilder, manifolds  # noqa: E402,F401
from . import query  # noqa: E402,F401  post-solve trajectory queries (§3.4)
from . import marginals  # noqa: E402,F401  marginal/joint covariances (S12)
