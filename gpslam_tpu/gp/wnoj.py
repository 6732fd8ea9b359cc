"""White-noise-on-jerk (WNOJ / constant-acceleration) GP prior closed forms.

Extension of the reference's GPutils layer (SURVEY.md §2.1 G2) to the
third-order integrator chain required by BASELINE.json config 4 ("GP-WNOJ
prior"). Markov state x = [p; v; a] in R^{3d}; same Kronecker structure as
`wnoa.py`: every matrix is (3x3 scalar coefficient) (x) (I_d or Q_c power).

Closed forms (verified against dense inverses to 1e-14):
  P(dt) = [[1, dt, dt^2/2], [0, 1, dt], [0, 0, 1]]
  C(dt) = [[dt^5/20, dt^4/8, dt^3/6],
           [dt^4/8,  dt^3/3, dt^2/2],
           [dt^3/6,  dt^2/2, dt    ]]
  C(dt)^{-1} = [[720/dt^5, -360/dt^4, 60/dt^3],
                [-360/dt^4, 192/dt^3, -36/dt^2],
                [60/dt^3,   -36/dt^2,  9/dt  ]]
  chol(C^{-1}) = diag(dt^{-5/2}, dt^{-3/2}, dt^{-1/2}) @ chol(M),
  M = [[720,-360,60],[-360,192,-36],[60,-36,9]],
  chol(M) = [[12*sqrt5, 0, 0], [-6*sqrt5, 2*sqrt3, 0], [sqrt5, -sqrt3, 1]].
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_SQRT5 = math.sqrt(5.0)
_SQRT3 = math.sqrt(3.0)
# Constant lower-Cholesky factor of the normalized inverse coefficient matrix.
_CHOL_M = (
    (12.0 * _SQRT5, 0.0, 0.0),
    (-6.0 * _SQRT5, 2.0 * _SQRT3, 0.0),
    (_SQRT5, -_SQRT3, 1.0),
)


def phi_coeff(dt):
    """3x3 scalar state-transition coefficient P(dt)."""
    one = jnp.ones_like(dt)
    zero = jnp.zeros_like(dt)
    dt2h = dt * dt / 2.0
    return jnp.stack(
        [
            jnp.stack([one, dt, dt2h], -1),
            jnp.stack([zero, one, dt], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )


def q_coeff(dt):
    """3x3 scalar process-noise coefficient C(dt)."""
    dt2 = dt * dt
    dt3 = dt2 * dt
    dt4 = dt3 * dt
    dt5 = dt4 * dt
    return jnp.stack(
        [
            jnp.stack([dt5 / 20.0, dt4 / 8.0, dt3 / 6.0], -1),
            jnp.stack([dt4 / 8.0, dt3 / 3.0, dt2 / 2.0], -1),
            jnp.stack([dt3 / 6.0, dt2 / 2.0, dt], -1),
        ],
        axis=-2,
    )


def q_inv_coeff(dt):
    """Closed-form C(dt)^{-1}."""
    i1 = 1.0 / dt
    i2 = i1 * i1
    i3 = i2 * i1
    i4 = i3 * i1
    i5 = i4 * i1
    return jnp.stack(
        [
            jnp.stack([720.0 * i5, -360.0 * i4, 60.0 * i3], -1),
            jnp.stack([-360.0 * i4, 192.0 * i3, -36.0 * i2], -1),
            jnp.stack([60.0 * i3, -36.0 * i2, 9.0 * i1], -1),
        ],
        axis=-2,
    )


def q_inv_sqrt_coeff(dt):
    """Lower Cholesky factor of C(dt)^{-1}, via the constant-chol trick."""
    s = jnp.sqrt(dt)
    d0 = 1.0 / (dt * dt * s)  # dt^{-5/2}
    d1 = 1.0 / (dt * s)  # dt^{-3/2}
    d2 = 1.0 / s  # dt^{-1/2}
    zero = jnp.zeros_like(dt)
    m = _CHOL_M
    return jnp.stack(
        [
            jnp.stack([d0 * m[0][0], zero, zero], -1),
            jnp.stack([d1 * m[1][0], d1 * m[1][1], zero], -1),
            jnp.stack([d2 * m[2][0], d2 * m[2][1], d2 * m[2][2]], -1),
        ],
        axis=-2,
    )


def lambda_psi_coeffs(dt, tau):
    """Scalar 3x3 interpolation coefficients (L(tau), S(tau)); Q_c cancels."""
    S = q_coeff(tau) @ jnp.swapaxes(phi_coeff(dt - tau), -1, -2) @ q_inv_coeff(dt)
    L = phi_coeff(tau) - S @ phi_coeff(dt)
    return L, S


def interpolate(xi, vi, ai, xj, vj, aj, dt, tau):
    """WNOJ GP interpolation at t_i + tau -> (x_tau, v_tau, a_tau)."""
    L, S = lambda_psi_coeffs(dt, tau)

    def row(k):
        return (
            L[..., k, 0, None] * xi
            + L[..., k, 1, None] * vi
            + L[..., k, 2, None] * ai
            + S[..., k, 0, None] * xj
            + S[..., k, 1, None] * vj
            + S[..., k, 2, None] * aj
        )

    return row(0), row(1), row(2)
