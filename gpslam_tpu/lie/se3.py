"""Batched SE(3) operations on (R, t) pairs.

TPU-native equivalent of the reference's `gtsam/geometry/Pose3` (SURVEY.md
§2.2 S2). Poses are pairs (R: (...,3,3) rotation matrix, t: (...,3)); the
tangent is xi = [omega; v] with ROTATION FIRST — matching GTSAM's Pose3
convention so factor math and chi^2 bookkeeping line up with the reference.

Exp uses the full closed form (t = J_l(omega) v); the 6x6 right/left
Jacobians use Barfoot's Q matrix (State Estimation, eq. 7.86), giving exact
analytic derivatives — no first-order approximation as in the reference
papers. All branches are AD-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import so3

_SMALL2 = 1e-6


def identity(dtype=jnp.float32, batch_shape=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return R, t


def exp(xi):
    """(..., 6) tangent [omega, v] -> (R, t)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3.exp(w)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(w), v)
    return R, t


def log(R, t):
    """(R, t) -> (..., 6) tangent [omega, v]."""
    w = so3.log(R)
    v = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inv(w), t)
    return jnp.concatenate([w, v], axis=-1)


def compose(R1, t1, R2, t2):
    """T1 * T2."""
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def between(R1, t1, R2, t2):
    """T1^{-1} * T2 (the relative pose, GTSAM `between`)."""
    Ri, ti = inverse(R1, t1)
    return compose(Ri, ti, R2, t2)


def act(R, t, p):
    """Transform points: T * p, p: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def adjoint(R, t):
    """6x6 Adjoint in [omega, v] ordering: [[R, 0], [t^ R, R]]."""
    Z = jnp.zeros_like(R)
    tR = so3.hat(t) @ R
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _q_coeffs(theta2):
    """AD-safe c1=(t-sin t)/t^3, c2=(t^2+2cos t-2)/(2t^4),
    c3=(2t-3sin t+t cos t)/(2t^5)."""
    small = theta2 < _SMALL2
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    th = jnp.sqrt(t2s)
    s, c = jnp.sin(th), jnp.cos(th)
    c1 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (th - s) / (t2s * th))
    c2 = jnp.where(
        small, 1.0 / 24.0 - theta2 / 720.0, (t2s + 2.0 * c - 2.0) / (2.0 * t2s * t2s)
    )
    c3 = jnp.where(
        small,
        1.0 / 120.0 - theta2 / 2520.0,
        (2.0 * th - 3.0 * s + th * c) / (2.0 * t2s * t2s * th),
    )
    return c1, c2, c3


def _Q_left(w, v):
    """Barfoot's Q(v, w) coupling block of the SE(3) left Jacobian
    (State Estimation eq. 7.86, reordered for [omega, v] tangents)."""
    theta2 = jnp.sum(w * w, axis=-1)
    c1, c2, c3 = _q_coeffs(theta2)
    W, V = so3.hat(w), so3.hat(v)
    WV, VW = W @ V, V @ W
    WVW = WV @ W
    W2V, VW2 = W @ WV, VW @ W
    WVW2 = WVW @ W
    W2VW = W @ WVW
    c1 = c1[..., None, None]
    c2 = c2[..., None, None]
    c3 = c3[..., None, None]
    return 0.5 * V + c1 * (WV + VW + WVW) + c2 * (W2V + VW2 - 3.0 * WVW) + c3 * (
        WVW2 + W2VW
    )


def left_jacobian(xi):
    """6x6 SE(3) left Jacobian: [[J_l(w), 0], [Q(w,v), J_l(w)]]."""
    w, v = xi[..., :3], xi[..., 3:]
    J = so3.left_jacobian(w)
    Q = _Q_left(w, v)
    Z = jnp.zeros_like(J)
    top = jnp.concatenate([J, Z], axis=-1)
    bot = jnp.concatenate([Q, J], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def right_jacobian(xi):
    """6x6 SE(3) right Jacobian: J_r(xi) = J_l(-xi)."""
    return left_jacobian(-xi)


def left_jacobian_inv(xi):
    """Block inverse: [[Ji, 0], [-Ji Q Ji, Ji]] with Ji = J_l(w)^{-1}."""
    w, v = xi[..., :3], xi[..., 3:]
    Ji = so3.left_jacobian_inv(w)
    Q = _Q_left(w, v)
    B = -Ji @ Q @ Ji
    Z = jnp.zeros_like(Ji)
    top = jnp.concatenate([Ji, Z], axis=-1)
    bot = jnp.concatenate([B, Ji], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def right_jacobian_inv(xi):
    return left_jacobian_inv(-xi)


def retract(R, t, delta):
    """Right retraction: T * Exp(delta), the GTSAM Pose3 retract."""
    dR, dt = exp(delta)
    return compose(R, t, dR, dt)


def local_coordinates(R1, t1, R2, t2):
    """Log(T1^{-1} T2): the tangent that retracts T1 onto T2."""
    Rb, tb = between(R1, t1, R2, t2)
    return log(Rb, tb)
