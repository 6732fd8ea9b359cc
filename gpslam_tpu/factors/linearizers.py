"""Hand-derived factor linearizers (reference: the analytic evaluateError
Jacobians of G3/G9 and GTSAM's stock factors; SURVEY.md §2.3).

Each function maps (slot values..., params) -> (whitened r, (whitened J per
slot)) for ONE factor; the graph layer vmaps it. These replace the jacfwd
default on the hot linear-model factor types — the linear WNOA chain's
Jacobians are closed-form (mostly constant in the state), so skipping AD
removes the ~(tangent-dim) x cost multiplier of forward-mode.

Conventions identical to the AD path: Jacobians w.r.t. local coordinates at
the evaluation point, residuals whitened (factors' cost = 0.5 |r|^2).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..gp import wnoa


def _wnoa_whiten_matrix(dt, qc_sqrt_info):
    """Dense (2d, 2d) whitening matrix W with W r = whitened residual:
    W[i, j] block = WC[j, i] * A_q (see gp_priors._whiten_gp)."""
    WC = wnoa.q_inv_sqrt_coeff(dt)  # (2, 2) lower
    A = qc_sqrt_info  # (d, d)
    Z = jnp.zeros_like(A)
    # rw_i = sum_j WC[j, i] * A r_j  ->  W = WC^T (x) A (upper triangular)
    top = jnp.concatenate(
        [WC[..., 0, 0, None, None] * A, WC[..., 1, 0, None, None] * A], axis=-1
    )
    bot = jnp.concatenate([Z, WC[..., 1, 1, None, None] * A], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)  # (2d, 2d)


def gp_prior_linear(state_i, state_j, params):
    """Analytic twin of gp_priors.gp_prior_linear.

    Unwhitened: r = [xj - xi - dt vi ; vj - vi];
    J_i = [[-I, -dt I], [0, -I]], J_j = I_{2d}.
    """
    (xi, vi), (xj, vj) = state_i, state_j
    dt = params["dt"]
    d = xi.shape[-1]
    r_raw = jnp.concatenate([xj - xi - dt * vi, vj - vi], -1)
    W = _wnoa_whiten_matrix(dt, params["qc_sqrt_info"])
    r = W @ r_raw
    I = jnp.eye(d, dtype=xi.dtype)
    Z = jnp.zeros((d, d), xi.dtype)
    Ji_raw = jnp.concatenate(
        [
            jnp.concatenate([-I, -dt * I], -1),
            jnp.concatenate([Z, -I], -1),
        ],
        -2,
    )
    return r, (W @ Ji_raw, W)


def between_linear(state_i, state_j, params):
    """Analytic twin of measurements.between_linear:
    r = A (xj - xi - z); J_i = [-A | 0], J_j = [A | 0]."""
    (xi, _vi), (xj, _vj) = state_i, state_j
    A = params["sqrt_info"]
    d = A.shape[-1]
    r = A @ (xj - xi - params["z"])
    Z = jnp.zeros_like(A)
    Jj = jnp.concatenate([A, Z], -1)
    return r, (-Jj, Jj)


def prior_linear_state(state, params):
    """Analytic twin of measurements.prior_linear_state: J = A."""
    x, v = state
    r = params["sqrt_info"] @ (jnp.concatenate([x, v], -1) - params["mu"])
    return r, (params["sqrt_info"],)


def prior_vector(value, params):
    x = value[0] if isinstance(value, tuple) else value
    r = params["sqrt_info"] @ (x - params["mu"])
    return r, (params["sqrt_info"],)


def interp_range_linear(state_i, state_j, landmark, params):
    """Analytic twin of measurements.interp_range_linear.

    x(tau) = L00 xi + L01 vi + S00 xj + S01 vj; u = x(tau) - l; e = |u|;
    r = (e - z)/sigma; dr/d(xi) = (u/e)^T L00 / sigma, etc.
    """
    (xi, vi), (xj, vj) = state_i, state_j
    dt, tau = params["dt"], params["tau"]
    L, S = wnoa.lambda_psi_coeffs(dt, tau)
    x_tau = (
        L[..., 0, 0, None] * xi
        + L[..., 0, 1, None] * vi
        + S[..., 0, 0, None] * xj
        + S[..., 0, 1, None] * vj
    )
    u = x_tau - landmark
    e = jnp.sqrt(jnp.sum(u * u, -1) + 1e-12)
    inv_sigma = params["inv_sigma"]
    r = ((e - params["z"]) * inv_sigma)[..., None]
    du = (u / e) * inv_sigma  # (d,) row of dr/d x(tau)
    Ji = jnp.concatenate([L[..., 0, 0] * du, L[..., 0, 1] * du], -1)[None, :]
    Jj = jnp.concatenate([S[..., 0, 0] * du, S[..., 0, 1] * du], -1)[None, :]
    Jl = (-du)[None, :]
    return r, (Ji, Jj, Jl)
