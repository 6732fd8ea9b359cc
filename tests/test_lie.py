"""Lie-group layer tests (reference pattern: GTSAM geometry tests + the
numericalDerivative checks of SURVEY.md §2.2 S13).

Every closed-form Jacobian is validated against a central finite difference of
the defining identity  Exp(xi + eps*delta) = Exp(xi) * Exp(J_r(xi) eps*delta).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.lie import se2, se3, so3

RNG = np.random.default_rng(0)


def rand_w(n, scale=1.0):
    return jnp.asarray(RNG.normal(size=(n, 3)) * scale)


# ---------------------------------------------------------------- SO(3)


def test_so3_exp_log_roundtrip():
    for scale in [1e-8, 1e-4, 0.5, 2.0]:
        w = rand_w(32, scale)
        # clip |w| < pi for uniqueness of log
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = jnp.where(norm > 3.1, w * 3.1 / norm, w)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w2, w, atol=1e-9)


def test_so3_log_near_pi():
    axis = jnp.asarray(RNG.normal(size=(16, 3)))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    for ang in [np.pi - 1e-3, np.pi - 1e-6, np.pi]:
        w = axis * ang
        R = so3.exp(w)
        w2 = so3.log(R)
        # at exactly pi the sign of the axis is ambiguous: compare rotations
        np.testing.assert_allclose(so3.exp(w2), R, atol=1e-7)
        np.testing.assert_allclose(
            jnp.linalg.norm(w2, axis=-1), ang, atol=1e-6
        )


def test_so3_exp_orthonormal():
    R = so3.exp(rand_w(64, 1.5))
    np.testing.assert_allclose(
        R @ jnp.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (64, 3, 3)),
        atol=1e-12,
    )
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)


def test_so3_right_jacobian_fd():
    xi = jnp.asarray(RNG.normal(size=(8, 3)) * 0.8)
    Jr = so3.right_jacobian(xi)
    eps = 1e-6
    for k in range(3):
        d = jnp.zeros((3,)).at[k].set(1.0)
        Rp = so3.exp(xi + eps * d)
        Rm = so3.exp(xi - eps * d)
        base = so3.exp(xi)
        baseT = jnp.swapaxes(base, -1, -2)
        fd = (so3.log(baseT @ Rp) - so3.log(baseT @ Rm)) / (2 * eps)
        np.testing.assert_allclose(Jr[..., :, k], fd, atol=1e-6)


def test_so3_jacobian_inverses():
    w = rand_w(32, 1.2)
    I = np.broadcast_to(np.eye(3), (32, 3, 3))
    np.testing.assert_allclose(
        so3.right_jacobian(w) @ so3.right_jacobian_inv(w), I, atol=1e-10
    )
    np.testing.assert_allclose(
        so3.left_jacobian(w) @ so3.left_jacobian_inv(w), I, atol=1e-10
    )


def test_so3_left_right_relation():
    w = rand_w(16, 1.0)
    # J_l(w) = R(w) J_r(w)
    np.testing.assert_allclose(
        so3.left_jacobian(w), so3.exp(w) @ so3.right_jacobian(w), atol=1e-10
    )


def test_so3_small_angle_ad_safe():
    """Gradients at exactly zero rotation must be finite."""
    g = jax.jacobian(lambda w: so3.exp(w).ravel())(jnp.zeros(3))
    assert np.all(np.isfinite(g))
    g2 = jax.jacobian(lambda w: so3.right_jacobian(w).ravel())(jnp.zeros(3))
    assert np.all(np.isfinite(g2))
    g3 = jax.jacobian(lambda w: so3.left_jacobian_inv(w).ravel())(jnp.zeros(3))
    assert np.all(np.isfinite(g3))


# ---------------------------------------------------------------- SE(3)


def test_se3_exp_log_roundtrip():
    xi = jnp.asarray(RNG.normal(size=(32, 6)))
    xi = xi.at[:, :3].multiply(0.7)
    R, t = se3.exp(xi)
    np.testing.assert_allclose(se3.log(R, t), xi, atol=1e-10)


def test_se3_compose_inverse():
    xi1 = jnp.asarray(RNG.normal(size=(16, 6)) * 0.5)
    xi2 = jnp.asarray(RNG.normal(size=(16, 6)) * 0.5)
    T1 = se3.exp(xi1)
    T2 = se3.exp(xi2)
    R, t = se3.compose(*T1, *T2)
    Ri, ti = se3.inverse(R, t)
    Rb, tb = se3.compose(Ri, ti, R, t)
    np.testing.assert_allclose(Rb, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-12)
    np.testing.assert_allclose(tb, 0, atol=1e-12)
    # between(T1, T1*T2) == T2
    Rc, tc = se3.between(*T1, R, t)
    np.testing.assert_allclose(Rc, T2[0], atol=1e-12)
    np.testing.assert_allclose(tc, T2[1], atol=1e-12)


def test_se3_right_jacobian_fd():
    xi = jnp.asarray(RNG.normal(size=(8, 6)) * 0.6)
    Jr = se3.right_jacobian(xi)
    eps = 1e-6
    base = se3.exp(xi)
    for k in range(6):
        d = jnp.zeros((6,)).at[k].set(1.0)
        p = se3.exp(xi + eps * d)
        m = se3.exp(xi - eps * d)
        fd = (
            se3.log(*se3.between(*base, *p)) - se3.log(*se3.between(*base, *m))
        ) / (2 * eps)
        np.testing.assert_allclose(Jr[..., :, k], fd, atol=1e-5)


def test_se3_jacobian_inv():
    xi = jnp.asarray(RNG.normal(size=(16, 6)) * 0.8)
    I = np.broadcast_to(np.eye(6), (16, 6, 6))
    np.testing.assert_allclose(
        se3.right_jacobian(xi) @ se3.right_jacobian_inv(xi), I, atol=1e-9
    )
    np.testing.assert_allclose(
        se3.left_jacobian(xi) @ se3.left_jacobian_inv(xi), I, atol=1e-9
    )


def test_se3_adjoint():
    """Ad_T xi == Log(T Exp(xi) T^{-1})."""
    xiT = jnp.asarray(RNG.normal(size=(8, 6)) * 0.5)
    xi = jnp.asarray(RNG.normal(size=(8, 6)) * 0.3)
    T = se3.exp(xiT)
    Ad = se3.adjoint(*T)
    lhs = jnp.einsum("...ij,...j->...i", Ad, xi)
    E = se3.exp(xi)
    TE = se3.compose(*T, *E)
    Tinv = se3.inverse(*T)
    rhs = se3.log(*se3.compose(*TE, *Tinv))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_se3_retract_local_inverse():
    xi = jnp.asarray(RNG.normal(size=(16, 6)) * 0.5)
    d = jnp.asarray(RNG.normal(size=(16, 6)) * 0.3)
    T = se3.exp(xi)
    T2 = se3.retract(*T, d)
    np.testing.assert_allclose(se3.local_coordinates(*T, *T2), d, atol=1e-10)


# ---------------------------------------------------------------- SE(2)


def test_se2_exp_log_roundtrip():
    xi = jnp.asarray(RNG.normal(size=(32, 3)))
    xi = xi.at[:, 2].multiply(0.8)
    np.testing.assert_allclose(se2.log(se2.exp(xi)), xi, atol=1e-12)


def test_se2_compose_inverse():
    p1 = se2.exp(jnp.asarray(RNG.normal(size=(16, 3)) * 0.5))
    p2 = se2.exp(jnp.asarray(RNG.normal(size=(16, 3)) * 0.5))
    c = se2.compose(p1, p2)
    b = se2.between(p1, c)
    np.testing.assert_allclose(b, p2, atol=1e-12)
    ident = se2.compose(p1, se2.inverse(p1))
    np.testing.assert_allclose(ident, 0, atol=1e-12)


def test_se2_right_jacobian_fd():
    xi = jnp.asarray(RNG.normal(size=(8, 3)) * 0.7)
    Jr = se2.right_jacobian(xi)
    eps = 1e-7
    base = se2.exp(xi)
    for k in range(3):
        d = jnp.zeros((3,)).at[k].set(1.0)
        fd = (
            se2.log(se2.between(base, se2.exp(xi + eps * d)))
            - se2.log(se2.between(base, se2.exp(xi - eps * d)))
        ) / (2 * eps)
        np.testing.assert_allclose(Jr[..., :, k], fd, atol=1e-6)


def test_se2_jacobian_inv():
    xi = jnp.asarray(RNG.normal(size=(16, 3)))
    I = np.broadcast_to(np.eye(3), (16, 3, 3))
    np.testing.assert_allclose(
        se2.right_jacobian(xi) @ se2.right_jacobian_inv(xi), I, atol=1e-12
    )


def test_se2_adjoint():
    xiT = jnp.asarray(RNG.normal(size=(8, 3)) * 0.5)
    xi = jnp.asarray(RNG.normal(size=(8, 3)) * 0.3)
    p = se2.exp(xiT)
    Ad = se2.adjoint(p)
    lhs = jnp.einsum("...ij,...j->...i", Ad, xi)
    rhs = se2.log(se2.compose(se2.compose(p, se2.exp(xi)), se2.inverse(p)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_se2_small_angle_ad_safe():
    g = jax.jacobian(se2.exp)(jnp.zeros(3))
    assert np.all(np.isfinite(g))
    g2 = jax.jacobian(lambda x: se2.right_jacobian(x).ravel())(jnp.zeros(3))
    assert np.all(np.isfinite(g2))


def test_so3_log_grad_at_identity():
    """d log(R)/d delta at R == I must be finite (regression: odometry-
    integrated inits make relative rotations EXACTLY identity; norm(qv) had
    a NaN derivative there)."""
    def f(w):
        return so3.log(so3.exp(w))

    J = jax.jacobian(f)(jnp.zeros(3))
    assert np.all(np.isfinite(J))
    np.testing.assert_allclose(J, np.eye(3), atol=1e-10)

    # through a between-style composition at identical poses
    def g(d):
        R1 = so3.exp(jnp.array([0.3, -0.2, 0.5]))
        R2 = so3.exp(jnp.array([0.3, -0.2, 0.5])) @ so3.exp(d)
        return so3.log(jnp.swapaxes(R1, -1, -2) @ R2)

    Jg = jax.jacobian(g)(jnp.zeros(3))
    assert np.all(np.isfinite(Jg))


def test_se3_between_jacobian_finite_at_exact_odometry():
    from gpslam_tpu.factors import measurements

    xi = jnp.asarray(RNG.normal(size=(6,)) * 0.4)
    T1 = se3.exp(xi)
    rel = jnp.asarray(RNG.normal(size=(6,)) * 0.3)
    T2 = se3.compose(*T1, *se3.exp(rel))
    zR, zt = se3.exp(rel)  # measurement equals the true relative pose
    params = {"z_R": zR, "z_t": zt, "sqrt_info": jnp.eye(6)}

    def res(d):
        T2p = se3.retract(*T2, d)
        return measurements.between_se3((T1, None), (T2p, None), params)

    J = jax.jacobian(res)(jnp.zeros(6))
    assert np.all(np.isfinite(J)), J


# ---------------------------------------------------------------- f32 path


def test_f32_dtype_preserved():
    w = rand_w(8, 0.5).astype(jnp.float32)
    assert so3.exp(w).dtype == jnp.float32
    assert so3.log(so3.exp(w)).dtype == jnp.float32
    xi = jnp.asarray(RNG.normal(size=(8, 6)), dtype=jnp.float32)
    R, t = se3.exp(xi)
    assert R.dtype == jnp.float32 and t.dtype == jnp.float32
    assert se3.right_jacobian_inv(xi).dtype == jnp.float32
    p = se2.exp(xi[:, :3])
    assert p.dtype == jnp.float32


def test_f32_roundtrip_accuracy():
    xi = jnp.asarray(RNG.normal(size=(64, 6)) * 0.7, dtype=jnp.float32)
    R, t = se3.exp(xi)
    np.testing.assert_allclose(se3.log(R, t), xi, atol=2e-6)
