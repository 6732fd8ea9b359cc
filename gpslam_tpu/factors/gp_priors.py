"""GP prior factor kernels (reference: gpslam/gp/GaussianProcessPrior{Linear,
Pose2,Pose3}.h, SURVEY.md §2.1 G3-G5; math §2.3 [PAPER]).

Each residual function maps (slot values..., params) -> WHITENED residual for
ONE factor; the graph layer vmaps it over the factor batch and differentiates
with jacfwd at the retraction zero-point, so cost is 0.5*|r|^2 in GTSAM's
convention.

Whitening exploits the Kronecker structure of Q(dt)^{-1} = C(dt)^{-1} (x)
Qc^{-1} (see gp/wnoa.py): with W_C = chol(C^{-1}) and A_q = chol(Qc^{-1})^T,
the whitened residual blocks are  rw_i = sum_j W_C[j, i] * (A_q r_j)  — two
(or three) d-vector ops instead of a 2d x 2d matmul.

Params per factor:
  dt          ()        support interval
  qc_sqrt_info (d, d)   A_q = chol(Qc^{-1})^T (upper triangular)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..gp import wnoa, wnoj
from ..lie import se2, se3


def _whiten_gp(r_blocks, dt, qc_sqrt_info, order):
    """Apply (chol(C^{-1}) (x) chol(Qc^{-1}))^T to stacked residual blocks."""
    WC = wnoa.q_inv_sqrt_coeff(dt) if order == 2 else wnoj.q_inv_sqrt_coeff(dt)
    Ar = [qc_sqrt_info @ rb for rb in r_blocks]
    out = []
    for i in range(order):
        acc = WC[..., i, i] * Ar[i]
        for j in range(i + 1, order):  # W_C lower: only j >= i contribute
            acc = acc + WC[..., j, i] * Ar[j]
        out.append(acc)
    return jnp.concatenate(out, axis=-1)


def gp_prior_linear(state_i, state_j, params):
    """WNOA prior on a vector-space chain node (G3).

    state = (x, v) in (R^d, R^d); unwhitened residual
      r = [x_j - x_i - dt*v_i ; v_j - v_i],  covariance Q(dt).
    """
    (xi, vi), (xj, vj) = state_i, state_j
    dt = params["dt"]
    r_pos = xj - xi - dt * vi
    r_vel = vj - vi
    return _whiten_gp([r_pos, r_vel], dt, params["qc_sqrt_info"], order=2)


def gp_prior_linear_wnoj(state_i, state_j, params):
    """WNOJ prior on a vector-space chain node: state = (x, v, a)."""
    (xi, vi, ai), (xj, vj, aj) = state_i, state_j
    dt = params["dt"]
    r_pos = xj - xi - dt * vi - 0.5 * dt * dt * ai
    r_vel = vj - vi - dt * ai
    r_acc = aj - ai
    return _whiten_gp([r_pos, r_vel, r_acc], dt, params["qc_sqrt_info"], order=3)


def gp_prior_se2(state_i, state_j, params):
    """WNOA prior on SE(2) (G4): with xi_rel = Log(T_i^{-1} T_j),
    r = [xi_rel - dt*w_i ; Jr(xi_rel)^{-1} w_j - w_i], cov Q(dt), d=3."""
    (Ti, wi), (Tj, wj) = state_i, state_j
    dt = params["dt"]
    xr = se2.local_coordinates(Ti, Tj)
    r1 = xr - dt * wi
    r2 = se2.right_jacobian_inv(xr) @ wj - wi
    return _whiten_gp([r1, r2], dt, params["qc_sqrt_info"], order=2)


def gp_prior_se3(state_i, state_j, params):
    """WNOA prior on SE(3) (G5): same structure with d=6 twists."""
    ((Ri, ti), wi), ((Rj, tj), wj) = state_i, state_j
    dt = params["dt"]
    xr = se3.local_coordinates(Ri, ti, Rj, tj)
    r1 = xr - dt * wi
    r2 = se3.right_jacobian_inv(xr) @ wj - wi
    return _whiten_gp([r1, r2], dt, params["qc_sqrt_info"], order=2)


def gp_prior_se3_wnoj(state_i, state_j, params):
    """WNOJ prior on SE(3): state = (pose, twist, twist-acceleration).

    Local-frame approximation as in the WNOJ literature (gpmp2-style):
    propagate (xi, w, a) through the integrator chain on the tangent at T_i.
    """
    ((Ri, ti), wi, ai), ((Rj, tj), wj, aj) = state_i, state_j
    dt = params["dt"]
    xr = se3.local_coordinates(Ri, ti, Rj, tj)
    Jri = se3.right_jacobian_inv(xr)
    r1 = xr - dt * wi - 0.5 * dt * dt * ai
    r2 = Jri @ wj - wi - dt * ai
    r3 = Jri @ aj - ai
    return _whiten_gp([r1, r2, r3], dt, params["qc_sqrt_info"], order=3)
