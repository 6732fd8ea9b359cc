"""Measurement factor kernels (reference: gpslam/slam/*.h G9 + the stock GTSAM
factors the examples use — PriorFactor, BetweenFactor, RangeFactor,
BearingRangeFactor; SURVEY.md §2.1 note on G9).

All residuals are WHITENED (cost = 0.5*|r|^2). Common params:
  sqrt_info  (rdim, rdim)  A with A^T A = Sigma^{-1}  (full-covariance models)
  inv_sigma  ()            1/sigma                     (scalar models)
Slot values follow the chain-node structure of graph/manifolds.py:
  linear state  (x, v)
  se2 state     (pose(3,), vel(3,))
  se3 state     ((R, t), vel(6,))
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lie import se2, se3
from . import interpolate


def _safe_norm(d, eps=1e-12):
    """|d| with nonzero subgradient at 0 (AD-safe range residuals)."""
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + eps)


# ------------------------------------------------------------------ priors


def prior_vector(value, params):
    """Gaussian prior on an R^d variable: r = A (x - mu)."""
    (x,) = (value,) if not isinstance(value, tuple) else (value[0],)
    return params["sqrt_info"] @ (x - params["mu"])


def prior_linear_state(state, params):
    """Prior on a full (x, v[, a]) chain node: r = A (concat(parts) - mu)."""
    return params["sqrt_info"] @ (jnp.concatenate(state, -1) - params["mu"])


def prior_se2(state, params):
    """Pose prior: r = A * Log(Z^{-1} T) (GTSAM PriorFactor convention)."""
    pose = state[0] if isinstance(state, tuple) else state
    return params["sqrt_info"] @ se2.local_coordinates(params["mu"], pose)


def prior_se3(state, params):
    pose = state[0] if isinstance(state, tuple) else state
    muR, mut = params["mu_R"], params["mu_t"]
    return params["sqrt_info"] @ se3.local_coordinates(muR, mut, *pose)


def prior_se2_state(state, params):
    """Prior on (pose, vel): r = A [Log(Z^{-1} T); v - v0], rdim 6."""
    pose, vel = state
    r = jnp.concatenate(
        [se2.local_coordinates(params["mu_pose"], pose), vel - params["mu_vel"]], -1
    )
    return params["sqrt_info"] @ r


def prior_se3_state(state, params):
    (R, t), vel = state
    r = jnp.concatenate(
        [
            se3.local_coordinates(params["mu_R"], params["mu_t"], R, t),
            vel - params["mu_vel"],
        ],
        -1,
    )
    return params["sqrt_info"] @ r


# ------------------------------------------------------------------ odometry


def between_linear(state_i, state_j, params):
    """Relative-position odometry on vector states (WNOA or WNOJ nodes):
    r = A (x_j - x_i - z)."""
    xi, xj = state_i[0], state_j[0]
    return params["sqrt_info"] @ (xj - xi - params["z"])


def between_se2(state_i, state_j, params):
    """Relative-pose odometry: r = A * Log(Z^{-1} T_i^{-1} T_j)."""
    Ti = state_i[0] if isinstance(state_i, tuple) else state_i
    Tj = state_j[0] if isinstance(state_j, tuple) else state_j
    rel = se2.between(Ti, Tj)
    return params["sqrt_info"] @ se2.local_coordinates(params["z"], rel)


def between_se3(state_i, state_j, params):
    Ti = state_i[0] if isinstance(state_i, tuple) else state_i
    Tj = state_j[0] if isinstance(state_j, tuple) else state_j
    Rr, tr = se3.between(*Ti, *Tj)
    return params["sqrt_info"] @ se3.local_coordinates(
        params["z_R"], params["z_t"], Rr, tr
    )


# ------------------------------------------------------------------ range


def range_linear(state, landmark, params):
    """Range from a vector-state position to a landmark: r = (|x-l| - z)/s."""
    x = state[0]
    r = (_safe_norm(x - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


def range_se2(state, landmark, params):
    """Range from an SE(2) pose (sensor at body origin) to a 2D landmark."""
    pose = state[0] if isinstance(state, tuple) else state
    r = (_safe_norm(pose[..., :2] - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


def range_se3(state, landmark, params):
    (R, t) = state[0]
    r = (_safe_norm(t - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


# ------------------------------------------- GP-interpolated measurements


def interp_range_linear(state_i, state_j, landmark, params):
    """THE Plaza factor (G9): range measured at tau in (t_i, t_j), hung on the
    two bracketing chain nodes via WNOA interpolation. 5-ary in the reference
    (x_i, v_i, x_j, v_j, l); here 3 slots (node_i, node_j, landmark)."""
    (xi, vi), (xj, vj) = state_i, state_j
    x_tau, _ = interpolate.interp_linear(xi, vi, xj, vj, params["dt"], params["tau"])
    r = (_safe_norm(x_tau - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


def interp_range_linear_wnoj(state_i, state_j, landmark, params):
    """WNOJ variant of the interpolated range factor (config-4 model class
    on vector states: (x, v, a) chain nodes)."""
    (xi, vi, ai), (xj, vj, aj) = state_i, state_j
    x_tau, _, _ = interpolate.interp_linear_wnoj(
        xi, vi, ai, xj, vj, aj, params["dt"], params["tau"]
    )
    r = (_safe_norm(x_tau - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


def interp_range_se2(state_i, state_j, landmark, params):
    (Ti, wi), (Tj, wj) = state_i, state_j
    pose, _ = interpolate.interp_se2(Ti, wi, Tj, wj, params["dt"], params["tau"])
    r = (_safe_norm(pose[..., :2] - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


def interp_range_se3(state_i, state_j, landmark, params):
    ((Ri, ti), wi), ((Rj, tj), wj) = state_i, state_j
    (R, t), _ = interpolate.interp_se3(Ri, ti, wi, Rj, tj, wj, params["dt"], params["tau"])
    r = (_safe_norm(t - landmark) - params["z"]) * params["inv_sigma"]
    return r[..., None]


# ------------------------------------------------------------------ bearing


def _wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def bearing_range_se2(state, landmark, params):
    """SE(2) bearing-range to a 2D landmark (config 3 workload):
    r = [wrap(bearing - z_b) * inv_sigma_b, (range - z_r) * inv_sigma_r]."""
    pose = state[0] if isinstance(state, tuple) else state
    # landmark in body frame
    d = landmark - pose[..., :2]
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    local = jnp.stack([c * d[..., 0] + s * d[..., 1], -s * d[..., 0] + c * d[..., 1]], -1)
    bearing = jnp.arctan2(local[..., 1], local[..., 0])
    rng = _safe_norm(d)
    rb = _wrap_angle(bearing - params["z_bearing"]) * params["inv_sigma_bearing"]
    rr = (rng - params["z_range"]) * params["inv_sigma_range"]
    return jnp.stack([rb, rr], -1)
