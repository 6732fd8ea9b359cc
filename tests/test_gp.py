"""GP closed-form tests (reference pattern: GPutils + interpolator tests,
SURVEY.md §4 items 1-2): golden values from §2.3, endpoint identities,
Kronecker-consistency against dense f64 constructions."""

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.gp import wnoa, wnoj

RNG = np.random.default_rng(1)


# ---------------------------------------------------------------- WNOA


def test_wnoa_golden():
    dt = jnp.asarray(0.5)
    P = wnoa.phi_coeff(dt)
    np.testing.assert_allclose(P, [[1.0, 0.5], [0.0, 1.0]])
    C = wnoa.q_coeff(dt)
    np.testing.assert_allclose(
        C, [[0.5**3 / 3, 0.5**2 / 2], [0.5**2 / 2, 0.5]]
    )
    np.testing.assert_allclose(C @ wnoa.q_inv_coeff(dt), np.eye(2), atol=1e-12)


def test_wnoa_sqrt_info():
    dt = jnp.asarray([0.1, 0.5, 2.0])
    W = wnoa.q_inv_sqrt_coeff(dt)
    np.testing.assert_allclose(
        W @ jnp.swapaxes(W, -1, -2), wnoa.q_inv_coeff(dt), rtol=1e-12
    )
    # lower-triangular
    np.testing.assert_allclose(W[..., 0, 1], 0.0)


def test_wnoa_interp_endpoints():
    """tau=0 reproduces (x_i, v_i); tau=dt reproduces (x_j, v_j) exactly."""
    d = 3
    xi, vi, xj, vj = (jnp.asarray(RNG.normal(size=(d,))) for _ in range(4))
    dt = jnp.asarray(0.7)
    x0, v0 = wnoa.interpolate(xi, vi, xj, vj, dt, jnp.asarray(0.0))
    np.testing.assert_allclose(x0, xi, atol=1e-12)
    np.testing.assert_allclose(v0, vi, atol=1e-12)
    x1, v1 = wnoa.interpolate(xi, vi, xj, vj, dt, dt)
    np.testing.assert_allclose(x1, xj, atol=1e-10)
    np.testing.assert_allclose(v1, vj, atol=1e-10)


def test_wnoa_interp_matches_dense():
    """Kronecker shortcut == dense Lambda/Psi construction with full Q_c."""
    d = 2
    Qc = np.array([[2.0, 0.3], [0.3, 1.5]])
    dt, tau = 0.9, 0.33

    def kron_dense(Cfun, M):
        return np.kron(Cfun, M)

    Phi = kron_dense(np.array(wnoa.phi_coeff(jnp.asarray(dt))), np.eye(d))
    Phi_jt = kron_dense(np.array(wnoa.phi_coeff(jnp.asarray(dt - tau))), np.eye(d))
    Q_tau = kron_dense(np.array(wnoa.q_coeff(jnp.asarray(tau))), Qc)
    Qinv = kron_dense(np.array(wnoa.q_inv_coeff(jnp.asarray(dt))), np.linalg.inv(Qc))
    Psi = Q_tau @ Phi_jt.T @ Qinv
    Lam = kron_dense(np.array(wnoa.phi_coeff(jnp.asarray(tau))), np.eye(d)) - Psi @ Phi

    xi, vi, xj, vj = (RNG.normal(size=(d,)) for _ in range(4))
    state_i = np.concatenate([xi, vi])
    state_j = np.concatenate([xj, vj])
    dense = Lam @ state_i + Psi @ state_j

    x_t, v_t = wnoa.interpolate(
        jnp.asarray(xi), jnp.asarray(vi), jnp.asarray(xj), jnp.asarray(vj),
        jnp.asarray(dt), jnp.asarray(tau),
    )
    np.testing.assert_allclose(np.concatenate([x_t, v_t]), dense, atol=1e-10)


def test_wnoa_prior_whitened_cost_matches_dense():
    """|W^T r|^2 == r^T Q^{-1} r with W = chol(C^{-1}) (x) chol(Qc^{-1})."""
    d = 2
    Qc = np.array([[1.7, -0.2], [-0.2, 0.9]])
    dt = 0.45
    r = RNG.normal(size=(2 * d,))
    Qinv = np.kron(np.array(wnoa.q_inv_coeff(jnp.asarray(dt))), np.linalg.inv(Qc))
    expect = r @ Qinv @ r
    Wc = np.array(wnoa.q_inv_sqrt_coeff(jnp.asarray(dt)))
    Wq = np.linalg.cholesky(np.linalg.inv(Qc))
    W = np.kron(Wc, Wq)
    got = np.sum((W.T @ r) ** 2)
    np.testing.assert_allclose(got, expect, rtol=1e-10)


# ---------------------------------------------------------------- WNOJ


def test_wnoj_qinv_closed_form():
    dt = jnp.asarray([0.2, 1.0, 3.3])
    C = wnoj.q_coeff(dt)
    np.testing.assert_allclose(
        C @ wnoj.q_inv_coeff(dt),
        np.broadcast_to(np.eye(3), (3, 3, 3)),
        atol=1e-9,
    )


def test_wnoj_sqrt_info():
    dt = jnp.asarray([0.2, 1.0, 3.3])
    W = wnoj.q_inv_sqrt_coeff(dt)
    np.testing.assert_allclose(
        W @ jnp.swapaxes(W, -1, -2), wnoj.q_inv_coeff(dt), rtol=1e-10
    )


def test_wnoj_interp_endpoints():
    d = 3
    s = [jnp.asarray(RNG.normal(size=(d,))) for _ in range(6)]
    dt = jnp.asarray(0.6)
    out0 = wnoj.interpolate(*s, dt, jnp.asarray(0.0))
    for got, exp in zip(out0, s[:3]):
        np.testing.assert_allclose(got, exp, atol=1e-12)
    out1 = wnoj.interpolate(*s, dt, dt)
    for got, exp in zip(out1, s[3:]):
        np.testing.assert_allclose(got, exp, atol=1e-9)


def test_wnoj_phi_semigroup():
    """P(a+b) = P(a) P(b) — integrator-chain transition property."""
    a, b = jnp.asarray(0.3), jnp.asarray(1.1)
    np.testing.assert_allclose(
        wnoj.phi_coeff(a + b), wnoj.phi_coeff(a) @ wnoj.phi_coeff(b), atol=1e-12
    )
    np.testing.assert_allclose(
        wnoa.phi_coeff(a + b), wnoa.phi_coeff(a) @ wnoa.phi_coeff(b), atol=1e-12
    )


def test_wnoa_q_consistency():
    """Q(a+b) = P(b) Q(a) P(b)^T + Q(b) — SDE covariance propagation."""
    a, b = jnp.asarray(0.4), jnp.asarray(0.9)
    for mod in (wnoa, wnoj):
        Pb = mod.phi_coeff(b)
        lhs = mod.q_coeff(a + b)
        rhs = Pb @ mod.q_coeff(a) @ Pb.T + mod.q_coeff(b)
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)
