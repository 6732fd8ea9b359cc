"""White-noise-on-acceleration (WNOA / constant-velocity) GP prior closed forms.

TPU-native equivalent of the reference's `gpslam/gp/GPutils.{h,cpp}` (SURVEY.md
§2.1 G2, math in §2.3 [PAPER]): the LTI-SDE  xdot = A x + F w  with Markov
state x = [p; v] in R^{2d}, A = [[0, I], [0, 0]], F = [0; I], white noise with
spectral density Q_c in R^{d x d}.

KEY STRUCTURAL FACT exploited throughout (not in the reference, which builds
the full 2d x 2d matrices): every matrix here is a Kronecker product
C (x) Q-power with C a 2x2 *scalar* coefficient matrix:

    Phi(dt)      = P(dt)      (x) I_d,   P = [[1, dt], [0, 1]]
    Q(dt)        = C(dt)      (x) Q_c,   C = [[dt^3/3, dt^2/2], [dt^2/2, dt]]
    Q(dt)^{-1}   = C(dt)^{-1} (x) Q_c^{-1}
    Lambda(tau)  = L(tau)     (x) I_d
    Psi(tau)     = S(tau)     (x) I_d        (Q_c cancels exactly in Psi/Lambda)

so interpolation needs only four scalars each for Lambda and Psi, and the
sqrt-information of the prior factorizes as chol(C^{-1}) (x) chol(Q_c^{-1}).
All functions are batched over leading dims of `dt`/`tau` and AD-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def phi_coeff(dt):
    """2x2 scalar state-transition coefficient P(dt) = [[1, dt], [0, 1]]."""
    one = jnp.ones_like(dt)
    zero = jnp.zeros_like(dt)
    return jnp.stack(
        [jnp.stack([one, dt], -1), jnp.stack([zero, one], -1)], axis=-2
    )


def q_coeff(dt):
    """2x2 scalar process-noise coefficient C(dt)."""
    dt2 = dt * dt
    dt3 = dt2 * dt
    return jnp.stack(
        [
            jnp.stack([dt3 / 3.0, dt2 / 2.0], -1),
            jnp.stack([dt2 / 2.0, dt], -1),
        ],
        axis=-2,
    )


def q_inv_coeff(dt):
    """Closed-form C(dt)^{-1} = [[12/dt^3, -6/dt^2], [-6/dt^2, 4/dt]]."""
    i1 = 1.0 / dt
    i2 = i1 * i1
    i3 = i2 * i1
    return jnp.stack(
        [
            jnp.stack([12.0 * i3, -6.0 * i2], -1),
            jnp.stack([-6.0 * i2, 4.0 * i1], -1),
        ],
        axis=-2,
    )


def q_inv_sqrt_coeff(dt):
    """Lower Cholesky factor W of C(dt)^{-1} = W W^T, closed form.

    chol([[12/dt^3, -6/dt^2], [-6/dt^2, 4/dt]]):
      L00 = sqrt(12)/dt^{3/2}, L10 = -6/dt^2 / L00 = -sqrt(3)/sqrt(dt^3)*dt...
    computed directly so no linalg call is needed.
    """
    s = jnp.sqrt(dt)
    l00 = jnp.sqrt(12.0) / (dt * s)
    l10 = -6.0 / (dt * dt) / l00
    # l11 = sqrt(4/dt - l10^2) = sqrt(4/dt - 3/dt) = 1/sqrt(dt)
    l11 = 1.0 / s
    zero = jnp.zeros_like(dt)
    return jnp.stack(
        [jnp.stack([l00, zero], -1), jnp.stack([l10, l11], -1)], axis=-2
    )


def lambda_psi_coeffs(dt, tau):
    """Scalar 2x2 interpolation coefficients (L(tau), S(tau)).

    S(tau) = C(tau) P(dt - tau)^T C(dt)^{-1}
    L(tau) = P(tau) - S(tau) P(dt)
    with tau measured from t_i (0 < tau < dt). Q_c cancels exactly
    (SURVEY.md §2.3), so these are Q_c-independent.
    """
    S = q_coeff(tau) @ jnp.swapaxes(phi_coeff(dt - tau), -1, -2) @ q_inv_coeff(dt)
    L = phi_coeff(tau) - S @ phi_coeff(dt)
    return L, S


def interpolate(xi, vi, xj, vj, dt, tau):
    """Vector-space GP interpolation at time t_i + tau.

    x(tau) = L00 x_i + L01 v_i + S00 x_j + S01 v_j  (and v(tau) likewise),
    where the scalars broadcast over the state dimension. Shapes:
    xi/vi/xj/vj: (..., d); dt/tau: (...,). Returns (x_tau, v_tau).
    """
    L, S = lambda_psi_coeffs(dt, tau)
    x_tau = (
        L[..., 0, 0, None] * xi
        + L[..., 0, 1, None] * vi
        + S[..., 0, 0, None] * xj
        + S[..., 0, 1, None] * vj
    )
    v_tau = (
        L[..., 1, 0, None] * xi
        + L[..., 1, 1, None] * vi
        + S[..., 1, 0, None] * xj
        + S[..., 1, 1, None] * vj
    )
    return x_tau, v_tau
