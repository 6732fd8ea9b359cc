"""Batched SE(2) operations on (x, y, theta) arrays.

TPU-native equivalent of the reference's `gtsam/geometry/Pose2` (SURVEY.md
§2.2 S2). Poses are (..., 3) arrays [x, y, theta]; the tangent is
[v_x, v_y, omega] with TRANSLATION FIRST — matching GTSAM's Pose2 convention.

The 3x3 right/left Jacobians are exact closed forms obtained from
J_r(xi) = \\int_0^1 Adj(Exp(-s xi)) ds (derivation in docstrings), with
AD-safe small-angle Taylor branches.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL2 = 1e-8


def _sc_coeffs(theta):
    """AD-safe a = sin(t)/t, b = (1-cos(t))/t."""
    theta2 = theta * theta
    small = theta2 < _SMALL2
    th_safe = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th_safe) / th_safe)
    b = jnp.where(small, theta / 2.0 - theta * theta2 / 24.0, (1.0 - jnp.cos(th_safe)) / th_safe)
    return a, b


def identity(dtype=jnp.float32, batch_shape=()):
    return jnp.zeros((*batch_shape, 3), dtype=dtype)


def rotmat(theta):
    """(...,) -> (..., 2, 2) rotation matrix."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def exp(xi):
    """(..., 3) tangent [v_x, v_y, omega] -> (..., 3) pose [x, y, theta].

    t = V(omega) v with V = (1/w)[[sin w, -(1-cos w)], [1-cos w, sin w]].
    """
    v, w = xi[..., :2], xi[..., 2]
    a, b = _sc_coeffs(w)
    x = a * v[..., 0] - b * v[..., 1]
    y = b * v[..., 0] + a * v[..., 1]
    return jnp.stack([x, y, w], axis=-1)


def log(pose):
    """(..., 3) pose -> (..., 3) tangent [v_x, v_y, omega]."""
    t, w = pose[..., :2], pose[..., 2]
    a, b = _sc_coeffs(w)
    # V^{-1} = (1/(a^2+b^2)) [[a, b], [-b, a]]
    d = a * a + b * b
    vx = (a * t[..., 0] + b * t[..., 1]) / d
    vy = (-b * t[..., 0] + a * t[..., 1]) / d
    return jnp.stack([vx, vy, w], axis=-1)


def compose(p1, p2):
    """T1 * T2."""
    c, s = jnp.cos(p1[..., 2]), jnp.sin(p1[..., 2])
    x = p1[..., 0] + c * p2[..., 0] - s * p2[..., 1]
    y = p1[..., 1] + s * p2[..., 0] + c * p2[..., 1]
    th = p1[..., 2] + p2[..., 2]
    return jnp.stack([x, y, th], axis=-1)


def inverse(p):
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = -(c * p[..., 0] + s * p[..., 1])
    y = -(-s * p[..., 0] + c * p[..., 1])
    return jnp.stack([x, y, -p[..., 2]], axis=-1)


def between(p1, p2):
    """T1^{-1} * T2, with the relative angle wrapped to (-pi, pi]."""
    rel = compose(inverse(p1), p2)
    th = _wrap(rel[..., 2])
    return jnp.concatenate([rel[..., :2], th[..., None]], axis=-1)


def _wrap(theta):
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def act(p, pt):
    """Transform 2D points: T * pt."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = p[..., 0] + c * pt[..., 0] - s * pt[..., 1]
    y = p[..., 1] + s * pt[..., 0] + c * pt[..., 1]
    return jnp.stack([x, y], axis=-1)


def adjoint(p):
    """3x3 Adjoint in [v, w] ordering: [[R, -S t], [0, 1]], S=[[0,-1],[1,0]]."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x, y = p[..., 0], p[..., 1]
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    row0 = jnp.stack([c, -s, y], axis=-1)
    row1 = jnp.stack([s, c, -x], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _jr_blocks(xi):
    """Closed-form blocks of J_r(xi) = \\int_0^1 Adj(Exp(-s xi)) ds.

    With theta = omega:
      M = (1/th)[[sin th, 1-cos th], [-(1-cos th), sin th]]   (= V(th)^T)
      u = S A v,  A = (1/th^2)[[1-cos th, th-sin th], [-(th-sin th), 1-cos th]]
    J_r = [[M, u], [0, 1]].
    """
    v, w = xi[..., :2], xi[..., 2]
    a, b = _sc_coeffs(w)  # a = sin/th, b = (1-cos)/th
    theta2 = w * w
    small = theta2 < _SMALL2
    th_safe = jnp.where(small, jnp.ones_like(w), w)
    # alpha = (1-cos th)/th^2, beta = (th - sin th)/th^2
    alpha = b / th_safe
    alpha = jnp.where(small, 0.5 - theta2 / 24.0, alpha)
    beta = jnp.where(small, w / 6.0 - w * theta2 / 120.0, (1.0 - a))
    beta = jnp.where(small, beta, beta / th_safe)
    # A v = [[alpha, beta], [-beta, alpha]] v ; u = S (A v)
    Av_x = alpha * v[..., 0] + beta * v[..., 1]
    Av_y = -beta * v[..., 0] + alpha * v[..., 1]
    u = jnp.stack([-Av_y, Av_x], axis=-1)
    # M = a I - b S' with [[a, b], [-b, a]]
    M = jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([-b, a], axis=-1)], axis=-2
    )
    return M, u


def right_jacobian(xi):
    """(..., 3) -> (..., 3, 3) exact SE(2) right Jacobian."""
    M, u = _jr_blocks(xi)
    top = jnp.concatenate([M, u[..., None]], axis=-1)
    zero = jnp.zeros_like(u[..., :1])
    one = jnp.ones_like(zero)
    bot = jnp.concatenate([zero, zero, one], axis=-1)[..., None, :]
    return jnp.concatenate([top, bot], axis=-2)


def right_jacobian_inv(xi):
    """Exact inverse via the block structure: [[M^-1, -M^-1 u], [0, 1]]."""
    M, u = _jr_blocks(xi)
    a, b = M[..., 0, 0], M[..., 0, 1]
    d = a * a + b * b
    Mi = jnp.stack(
        [jnp.stack([a / d, -b / d], axis=-1), jnp.stack([b / d, a / d], axis=-1)],
        axis=-2,
    )
    mu = -jnp.einsum("...ij,...j->...i", Mi, u)
    top = jnp.concatenate([Mi, mu[..., None]], axis=-1)
    zero = jnp.zeros_like(u[..., :1])
    one = jnp.ones_like(zero)
    bot = jnp.concatenate([zero, zero, one], axis=-1)[..., None, :]
    return jnp.concatenate([top, bot], axis=-2)


def left_jacobian(xi):
    return right_jacobian(-xi)


def left_jacobian_inv(xi):
    return right_jacobian_inv(-xi)


def retract(p, delta):
    """Right retraction: T * Exp(delta)."""
    return compose(p, exp(delta))


def local_coordinates(p1, p2):
    """Log(T1^{-1} T2)."""
    return log(between(p1, p2))
