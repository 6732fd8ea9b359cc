"""Batched SO(3) operations: hat/vee, Exp/Log, left/right Jacobians.

TPU-native equivalent of the reference's `gtsam/geometry/{SO3,Rot3}` layer
(SURVEY.md §2.2 row S2): rotations are stored as 3x3 matrices with arbitrary
leading batch dimensions, every op is a pure function usable under jit/vmap,
and all small-angle singularities are handled with AD-safe `where` branches
(both branches always evaluated on safe inputs so gradients never see NaN).

Tangent convention: omega is the rotation vector (axis * angle), acting on the
RIGHT: Exp(w) maps so(3) -> SO(3); retraction R_plus(R, w) = R @ Exp(w).
"""

from __future__ import annotations

import jax.numpy as jnp

# Switch to Taylor series below this squared angle. With f32, theta^2 ~ 1e-6
# means theta ~ 1e-3; the O(theta^4) series terms are then < 1e-12, below f32
# resolution, while the trig expressions start losing relative precision.
_SMALL2 = 1e-6


def hat(w):
    """so(3) hat map: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _trig_coeffs(theta2):
    """AD-safe A = sin(t)/t, B = (1-cos(t))/t^2, C = (t-sin(t))/t^3.

    Each coefficient is returned as a function of theta^2 only, with a Taylor
    branch near zero so the expressions (and their AD derivatives) are finite
    everywhere.
    """
    small = theta2 < _SMALL2
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)  # safe for sqrt/div
    theta = jnp.sqrt(t2s)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0, sin_t / theta)
    B = jnp.where(
        small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0, (1.0 - cos_t) / t2s
    )
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (theta - sin_t) / (t2s * theta),
    )
    return A, B, C


def exp(w):
    """Exponential map (Rodrigues): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _trig_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def _to_quaternion(R):
    """Rotation matrix -> unit quaternion (w, x, y, z), branchless Shepperd.

    All four candidate extractions are computed on safe inputs and the best-
    conditioned one (largest pivot) is selected with `where`, so the function
    is valid and AD-safe for every rotation including theta ~ pi.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    one = jnp.ones_like(tr)
    # Candidate pivots t_i; each is >= 0 up to rounding where its case applies.
    tw = 1.0 + tr
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    sw = jnp.sqrt(jnp.maximum(tw, 1e-12 * one))
    sx = jnp.sqrt(jnp.maximum(tx, 1e-12 * one))
    sy = jnp.sqrt(jnp.maximum(ty, 1e-12 * one))
    sz = jnp.sqrt(jnp.maximum(tz, 1e-12 * one))

    # Case w-largest
    qw0 = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    # Case x-largest
    qx0 = jnp.stack([(m21 - m12) / sx, sx, (m01 + m10) / sx, (m02 + m20) / sx], -1)
    # Case y-largest
    qy0 = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy, (m12 + m21) / sy], -1)
    # Case z-largest
    qz0 = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz], -1)

    # Pick the case with the largest pivot.
    pivots = jnp.stack([tw, tx, ty, tz], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    q = jnp.where(
        (case == 0)[..., None],
        qw0,
        jnp.where((case == 1)[..., None], qx0, jnp.where((case == 2)[..., None], qy0, qz0)),
    )
    q = 0.5 * q
    # Canonicalize to w >= 0 (rotation angle in [0, pi]).
    q = jnp.where((q[..., 0:1] < 0), -q, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def log(R):
    """Logarithm map: (..., 3, 3) -> (..., 3) rotation vector, |w| in [0, pi].

    Implemented via quaternion extraction + atan2, which is numerically robust
    for all angles (including near pi, where trace-based arccos formulas fail).
    """
    q = _to_quaternion(R)
    qw, qv = q[..., 0], q[..., 1:]
    # AD-safety: |qv| is non-differentiable at qv = 0 (exactly the identity
    # rotation — common: odometry-integrated inits make relative-rotation
    # errors exactly I). Work with nv2 = |qv|^2 (polynomial, smooth) and only
    # take sqrt on a where-guarded safe value.
    nv2 = jnp.sum(qv * qv, axis=-1)
    small = nv2 < 1e-14
    nv_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(nv2), nv2))
    half_theta = jnp.arctan2(nv_safe, qw)
    # w = 2 * half_theta * qv / |qv|; small-angle: 2*qv/qw * (1 - |qv|^2/(3 qw^2))
    scale_reg = 2.0 * half_theta / nv_safe
    qw_safe = jnp.where(jnp.abs(qw) < 1e-12, jnp.ones_like(qw), qw)
    scale_small = 2.0 / qw_safe * (1.0 - nv2 / (3.0 * qw_safe * qw_safe))
    scale = jnp.where(small, scale_small, scale_reg)
    return scale[..., None] * qv


def left_jacobian(w):
    """SO(3) left Jacobian J_l(w) = I + B*W + C*W^2, (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _trig_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def right_jacobian(w):
    """SO(3) right Jacobian J_r(w) = J_l(-w) = I - B*W + C*W^2."""
    return left_jacobian(-w)


def _inv_jacobian_coeff(theta2):
    """AD-safe D = 1/t^2 - (1+cos t)/(2 t sin t), the W^2 coefficient of J^-1."""
    small = theta2 < _SMALL2
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(t2s)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    D_reg = 1.0 / t2s - (1.0 + cos_t) / (2.0 * theta * sin_t)
    D_small = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0
    return jnp.where(small, D_small, D_reg)


def left_jacobian_inv(w):
    """Closed-form inverse left Jacobian: I - W/2 + D*W^2."""
    theta2 = jnp.sum(w * w, axis=-1)
    D = _inv_jacobian_coeff(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + D[..., None, None] * W2


def right_jacobian_inv(w):
    """Closed-form inverse right Jacobian: I + W/2 + D*W^2."""
    return left_jacobian_inv(-w)


def normalize(R):
    """Re-orthonormalize a near-rotation matrix (drift control after many
    retractions) via one Newton iteration of the polar decomposition:
    R <- R (3 I - R^T R) / 2. Exact for orthonormal input, contracts the
    orthogonality error quadratically; cheap (two 3x3 matmuls) and AD-safe
    (unlike SVD)."""
    I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return R @ (1.5 * I - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
