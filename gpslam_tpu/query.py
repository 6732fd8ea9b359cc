"""Post-solve trajectory queries: posterior mean (and, for vector-space
chains, full Laplace covariance) at ARBITRARY times tau — the reference's
interpolator entry point (gpslam/gp/GaussianProcessInterpolator*.h used from
scripts, SURVEY.md §3.4), batched over query times.

Mean: x(tau) = Lambda(tau) x_i + Psi(tau) x_j on the bracketing knots
(SURVEY.md §2.3); Lie variants compose through Exp as in
factors/interpolate.py.

Covariance (vector case): the GP bridge is linear-Gaussian, so the exact
posterior covariance at tau is

    Sigma(tau) = A Sigma_supp A^T + P_cond(tau) (x) Qc,
    A      = [Lambda(tau)  Psi(tau)]                 (Kronecker scalar form)
    P_cond = C(tau) - S(tau) P(dt - tau) C(tau)      (2x2 / 3x3 scalars)

where Sigma_supp is the JOINT covariance of the bracketing pair (x_i, x_j)
from the selected inverse (marginals.chain_joint_marginals) and P_cond is the
conditional covariance of x(tau) given both endpoints — zero at the knots, so
queries at knot times reproduce the knot marginals exactly. This extends the
reference, which interpolates means only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .factors.interpolate import gamma_se2, gamma_se3, interp_se2, interp_se3
from .gp import wnoa, wnoj
from .lie import se2 as se2_mod
from .lie import se3 as se3_mod
from . import marginals as marginals_mod


def locate(knot_times, times):
    """Bracketing interval for each query time: (k, tau, dt_k) with
    t_k <= time < t_{k+1} (clamped to the first/last interval)."""
    n = knot_times.shape[0]
    k = jnp.clip(jnp.searchsorted(knot_times, times, side="right") - 1, 0, n - 2)
    tau = times - knot_times[k]
    dtk = knot_times[k + 1] - knot_times[k]
    return k, tau, dtk


def query_linear(state, knot_times, times, order: int = 2):
    """Vector-space WNOA (order=2: state=(x, v)) or WNOJ (order=3:
    state=(x, v, a)) mean query. Returns the interpolated state tuple."""
    k, tau, dtk = locate(knot_times, times)
    if order == 2:
        x, v = state
        return wnoa.interpolate(x[k], v[k], x[k + 1], v[k + 1], dtk, tau)
    x, v, a = state
    return wnoj.interpolate(
        x[k], v[k], a[k], x[k + 1], v[k + 1], a[k + 1], dtk, tau
    )


def query_se2(state, knot_times, times):
    """SE(2) mean query: state = (T (N, 3), w (N, 3)) ->
    (pose(tau) (M, 3), body velocity(tau) (M, 3))."""
    T, w = state
    k, tau, dtk = locate(knot_times, times)
    # the interp kernels are per-factor functions (the graph layer vmaps
    # them); batch over query times the same way
    return jax.vmap(interp_se2)(T[k], w[k], T[k + 1], w[k + 1], dtk, tau)


def query_se3(state, knot_times, times):
    """SE(3) mean query: state = ((R (N,3,3), t (N,3)), w (N,6)) ->
    ((R, t)(tau), body twist(tau))."""
    (R, t), w = state
    k, tau, dtk = locate(knot_times, times)
    return jax.vmap(interp_se3)(
        R[k], t[k], w[k], R[k + 1], t[k + 1], w[k + 1], dtk, tau
    )


def _kron(C, B):
    """Batched Kronecker product: C (..., m, m) scalar coeffs, B (d, d) ->
    (..., m*d, m*d)."""
    m = C.shape[-1]
    d = B.shape[-1]
    out = C[..., :, None, :, None] * B[None, :, None, :]
    return out.reshape(*C.shape[:-2], m * d, m * d)


def query_posterior_linear(graph, values, times, knot_times, qc,
                           state_group: str = "state",
                           lm_group: Optional[str] = "landmark",
                           order: int = 2):
    """Posterior mean AND covariance at arbitrary times on a vector-space
    GP chain.

    qc: the GP spectral density — scalar (isotropic) or (d, d) matrix.
    Returns (mean_state_tuple, Sigma_tau (M, order*d, order*d)) with tangent
    ordering [x; v(; a)] matching the chain marginals.
    """
    state = values[state_group]
    mean = query_linear(state, knot_times, times, order=order)
    d = state[0].shape[-1]
    dtype = state[0].dtype
    Qc = (jnp.asarray(qc, dtype) * jnp.eye(d, dtype=dtype)
          if jnp.ndim(qc) == 0 else jnp.asarray(qc, dtype))

    Sigma, cross, _ = marginals_mod.chain_joint_marginals(
        graph, values, state_group, lm_group
    )
    k, tau, dtk = locate(knot_times, times)
    gp = wnoa if order == 2 else wnoj
    L, S = gp.lambda_psi_coeffs(dtk, tau)
    Pcond = gp.q_coeff(tau) - S @ gp.phi_coeff(dtk - tau) @ gp.q_coeff(tau)

    eye = jnp.eye(d, dtype=dtype)
    A = jnp.concatenate([_kron(L, eye), _kron(S, eye)], axis=-1)  # (M, b, 2b)
    b = order * d
    Sii = Sigma[k]
    Sjj = Sigma[k + 1]
    Sij = cross[k]
    top = jnp.concatenate([Sii, Sij], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(Sij, -1, -2), Sjj], axis=-1)
    Ssupp = jnp.concatenate([top, bot], axis=-2)  # (M, 2b, 2b)
    Sigma_tau = A @ Ssupp @ jnp.swapaxes(A, -1, -2) + _kron(Pcond, Qc)
    Sigma_tau = 0.5 * (Sigma_tau + jnp.swapaxes(Sigma_tau, -1, -2))
    assert Sigma_tau.shape[-1] == b
    return mean, Sigma_tau


def _joint_support_cov(graph, values, k, state_group, lm_group):
    Sigma, cross, _ = marginals_mod.chain_joint_marginals(
        graph, values, state_group, lm_group
    )
    Sij = cross[k]
    top = jnp.concatenate([Sigma[k], Sij], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(Sij, -1, -2), Sigma[k + 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)  # (M, 2b, 2b)


def _query_posterior_lie(lie, gamma_fn, interp_fn, unpack, pack,
                         graph, values, times, knot_times, qc,
                         state_group, lm_group):
    """Shared SE(2)/SE(3) posterior query: tangent covariance at tau is

        Sigma(tau) = A Sigma_supp A^T + B (P_cond (x) Qc) B^T

    with A = d(interp)/d(support tangents) by forward AD at the retraction
    zero, and B = blkdiag(Jr(xi_tau), Jr(xi_tau)) mapping the GP bridge's
    conditional gamma-noise into the output tangent (first order in the
    bridge perturbation — the same approximation order the reference's
    Lie-group factors use, SURVEY.md §2.3)."""
    d = 3 if lie is se2_mod else 6
    state = values[state_group]
    k, tau, dtk = locate(knot_times, times)
    Pi, wi, Pj, wj = unpack(state, k)
    mean_pose, mean_vel = jax.vmap(interp_fn)(*pack(Pi, wi, Pj, wj), dtk, tau)
    dtype = tau.dtype
    Qc = (jnp.asarray(qc, dtype) * jnp.eye(d, dtype=dtype)
          if jnp.ndim(qc) == 0 else jnp.asarray(qc, dtype))

    def f(ei, ej, Pi, wi, Pj, wj, dtk_, tau_, mp, mv):
        Pi2 = _retract(lie, Pi, ei[:d])
        Pj2 = _retract(lie, Pj, ej[:d])
        pose, vel = interp_fn(*pack(Pi2, wi + ei[d:], Pj2, wj + ej[d:]),
                              dtk_, tau_)
        return jnp.concatenate([_local(lie, mp, pose), vel - mv])

    z = jnp.zeros((2 * d,), dtype)
    Hi, Hj = jax.vmap(
        jax.jacfwd(f, argnums=(0, 1)),
        in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0),
    )(z, z, Pi, wi, Pj, wj, dtk, tau, mean_pose, mean_vel)
    A = jnp.concatenate([Hi, Hj], axis=-1)  # (M, 2d, 4d)
    Ssupp = _joint_support_cov(graph, values, k, state_group, lm_group)
    Sigma_tau = A @ Ssupp @ jnp.swapaxes(A, -1, -2)

    L, S = wnoa.lambda_psi_coeffs(dtk, tau)
    Pcond = wnoa.q_coeff(tau) - S @ wnoa.phi_coeff(dtk - tau) @ wnoa.q_coeff(tau)
    xi_tau, _ = jax.vmap(gamma_fn)(*pack(Pi, wi, Pj, wj), dtk, tau)
    Jr = lie.right_jacobian(xi_tau)  # (M, d, d)
    B = jnp.zeros((*Jr.shape[:-2], 2 * d, 2 * d), dtype)
    B = B.at[..., :d, :d].set(Jr).at[..., d:, d:].set(Jr)
    Sigma_tau = Sigma_tau + B @ _kron(Pcond, Qc) @ jnp.swapaxes(B, -1, -2)
    Sigma_tau = 0.5 * (Sigma_tau + jnp.swapaxes(Sigma_tau, -1, -2))
    return (mean_pose, mean_vel), Sigma_tau


def _retract(lie, P, delta):
    if lie is se2_mod:
        return se2_mod.retract(P, delta)
    return se3_mod.retract(*P, delta)


def _local(lie, a, b):
    if lie is se2_mod:
        return se2_mod.local_coordinates(a, b)
    return se3_mod.local_coordinates(*a, *b)


def query_posterior_se2(graph, values, times, knot_times, qc,
                        state_group: str = "state",
                        lm_group: Optional[str] = "landmark"):
    """Posterior mean AND tangent-space covariance at arbitrary times on an
    SE(2) GP chain. Returns ((pose, vel), Sigma_tau (M, 6, 6)); tangent
    ordering [pose (3); vel (3)] matching the chain marginals. Exact at knot
    times (reproduces the knot marginals); first-order in the GP bridge
    between knots."""

    def unpack(state, k):
        T, w = state
        return T[k], w[k], T[k + 1], w[k + 1]

    def pack(Pi, wi, Pj, wj):
        return (Pi, wi, Pj, wj)

    return _query_posterior_lie(se2_mod, gamma_se2, interp_se2, unpack, pack,
                                graph, values, times, knot_times, qc,
                                state_group, lm_group)


def query_posterior_se3(graph, values, times, knot_times, qc,
                        state_group: str = "state",
                        lm_group: Optional[str] = "landmark"):
    """SE(3) version of query_posterior_se2: ((pose=(R, t), twist),
    Sigma_tau (M, 12, 12)), tangent ordering [pose (6); twist (6)]."""

    def unpack(state, k):
        (R, t), w = state
        return (R[k], t[k]), w[k], (R[k + 1], t[k + 1]), w[k + 1]

    def pack(Pi, wi, Pj, wj):
        return (*Pi, wi, *Pj, wj)

    return _query_posterior_lie(se3_mod, gamma_se3, interp_se3, unpack, pack,
                                graph, values, times, knot_times, qc,
                                state_group, lm_group)
