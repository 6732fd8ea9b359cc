"""GP interpolators: recover the state at tau in (t_i, t_j) from the two
bracketing chain nodes (reference: gpslam/gp/GaussianProcessInterpolator*.h,
SURVEY.md §2.1 G6-G8; math §2.3 [PAPER] — the "exactly sparse" trick).

The Lambda/Psi coefficients are Q_c-independent 2x2 scalars (gp/wnoa.py), so
interpolation costs a handful of vector ops. These are plain functions used
both by interpolated measurement factors (differentiated through) and by
post-solve trajectory queries.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..gp import wnoa, wnoj
from ..lie import se2, se3

interp_linear = wnoa.interpolate  # (xi, vi, xj, vj, dt, tau) -> (x, v)
interp_linear_wnoj = wnoj.interpolate  # (..., ai, ..., aj, dt, tau) -> (x, v, a)


def _gamma_coeffs(dt, tau):
    L, S = wnoa.lambda_psi_coeffs(dt, tau)
    return L, S


def gamma_se2(Ti, wi, Tj, wj, dt, tau):
    """Interpolated local coordinates (xi(tau), u(tau)) on SE(2):
    gamma_i = [0; w_i], gamma_j = [xi_rel; Jr(xi_rel)^{-1} w_j],
    gamma(tau) = Lambda gamma_i + Psi gamma_j."""
    L, S = _gamma_coeffs(dt, tau)
    xr = se2.local_coordinates(Ti, Tj)
    gj_v = se2.right_jacobian_inv(xr) @ wj
    xi_tau = (
        L[..., 0, 1, None] * wi + S[..., 0, 0, None] * xr + S[..., 0, 1, None] * gj_v
    )
    u_tau = (
        L[..., 1, 1, None] * wi + S[..., 1, 0, None] * xr + S[..., 1, 1, None] * gj_v
    )
    return xi_tau, u_tau


def interp_se2(Ti, wi, Tj, wj, dt, tau):
    """SE(2) WNOA interpolation: returns (pose(tau), body velocity(tau)).

    T(tau) = T_i Exp(xi(tau)); w(tau) = Jr(xi(tau)) @ u(tau).
    """
    xi_tau, u_tau = gamma_se2(Ti, wi, Tj, wj, dt, tau)
    pose = se2.compose(Ti, se2.exp(xi_tau))
    vel = se2.right_jacobian(xi_tau) @ u_tau
    return pose, vel


def gamma_se3(Ri, ti, wi, Rj, tj, wj, dt, tau):
    """Interpolated local coordinates (xi(tau), u(tau)) on SE(3)."""
    L, S = _gamma_coeffs(dt, tau)
    xr = se3.local_coordinates(Ri, ti, Rj, tj)
    gj_v = se3.right_jacobian_inv(xr) @ wj
    xi_tau = (
        L[..., 0, 1, None] * wi + S[..., 0, 0, None] * xr + S[..., 0, 1, None] * gj_v
    )
    u_tau = (
        L[..., 1, 1, None] * wi + S[..., 1, 0, None] * xr + S[..., 1, 1, None] * gj_v
    )
    return xi_tau, u_tau


def interp_se3(Ri, ti, wi, Rj, tj, wj, dt, tau):
    """SE(3) WNOA interpolation: returns ((R, t)(tau), body twist(tau))."""
    xi_tau, u_tau = gamma_se3(Ri, ti, wi, Rj, tj, wj, dt, tau)
    R, t = se3.compose(Ri, ti, *se3.exp(xi_tau))
    vel = se3.right_jacobian(xi_tau) @ u_tau
    return (R, t), vel
