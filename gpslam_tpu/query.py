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


def _pairwise_support_cov(graph, values, k, state_group, lm_group):
    """Cross-covariances between the bracketing support pairs of ALL query
    pairs: Ssupp (M, M, 2b, 2b) with Ssupp[a, c] = Cov([x_{k_a}; x_{k_a+1}],
    [x_{k_c}; x_{k_c+1}]) from the selected inverse (arbitrary-gap blocks via
    marginals.tridiag_cross_at, landmark arrowhead correction included)."""
    import numpy as np

    Sigma, P, U, Y, Sc_inv = marginals_mod.chain_selected_inverse_parts(
        graph, values, state_group, lm_group
    )
    M = k.shape[0]
    b = Sigma.shape[-1]
    off = jnp.asarray([0, 1])
    # Cov(supp_a, supp_c) = Cov(supp_c, supp_a)^T: run the O(N) masked scans
    # only for pairs a <= c and mirror (M(M+1)/2 * 4 scans, not M^2 * 4)
    iu_a, iu_c = np.triu_indices(M)
    # rows[p, q] = k_a + p, cols[p, q] = k_c + q per upper pair
    rows = (k[iu_a][:, None, None] + off[None, :, None]
            + jnp.zeros((1, 1, 2), k.dtype))
    cols = (k[iu_c][:, None, None] + off[None, None, :]
            + jnp.zeros((1, 2, 1), k.dtype))
    Xu = marginals_mod.tridiag_cross_at(
        Sigma, P, U, rows.reshape(-1), cols.reshape(-1)
    ).reshape(len(iu_a), 2, 2, b, b)
    X = jnp.zeros((M, M, 2, 2, b, b), Sigma.dtype)
    X = X.at[iu_a, iu_c].set(Xu)
    # mirror: block (c, a) = transpose of (a, c) with the support-slot axes
    # swapped; diagonal entries rewrite themselves with their own transpose
    # (a no-op: Cov(supp_a, supp_a) is symmetric)
    X = X.at[iu_c, iu_a].set(
        jnp.swapaxes(jnp.swapaxes(Xu, 1, 2), -1, -2)
    )
    if Y is not None:
        Yi = Y[(k[:, None] + off[None, :]).reshape(-1)].reshape(M, 2, b, -1)
        corr = jnp.einsum("apbr,rs,cqds->acpqbd", Yi, Sc_inv, Yi)
        X = X + corr
    # (M, M, 2, b, 2, b) -> (M, M, 2b, 2b)
    return jnp.swapaxes(X, 3, 4).reshape(M, M, 2 * b, 2 * b)


def _bridge_cross_coeff(gp, tau_a, tau_c, dt, same_interval):
    """Scalar-coefficient GP-bridge cross-covariance Cov(x(tau_a), x(tau_c) |
    endpoints) for two query times in the SAME interval (zero otherwise —
    bridges in disjoint intervals are conditionally independent by the
    Markov property). For s = min(tau) <= t = max(tau):

        Pcond(s, t) = C(s) P(t - s)^T - S(s) P(dt - t) C(t)

    (prior-pinned cross-cov minus the endpoint conditioning; reduces to the
    diagonal Pcond at s == t). Oriented by transposing when tau_a > tau_c.
    """
    s = jnp.minimum(tau_a, tau_c)
    t = jnp.maximum(tau_a, tau_c)
    _, S_s = gp.lambda_psi_coeffs(dt, s)
    Pc = (gp.q_coeff(s) @ jnp.swapaxes(gp.phi_coeff(t - s), -1, -2)
          - S_s @ gp.phi_coeff(dt - t) @ gp.q_coeff(t))
    Pc = jnp.where(tau_a > tau_c, jnp.swapaxes(Pc, -1, -2), Pc)
    return jnp.where(same_interval, Pc, jnp.zeros_like(Pc))


def query_joint_posterior_linear(graph, values, times, knot_times, qc,
                                 state_group: str = "state",
                                 lm_group: Optional[str] = "landmark",
                                 order: int = 2):
    """JOINT posterior over M query times on a vector-space GP chain: the
    reference's JointMarginal capability extended to arbitrary
    continuous-time queries. Returns (mean_state_tuple, Sigma_joint
    (M, M, b, b)) with Sigma_joint[a, c] = Cov(state(tau_a), state(tau_c));
    the diagonal matches query_posterior_linear. Exact (linear-Gaussian):
    support cross-covariances from the selected inverse + the GP-bridge
    conditional cross term for query pairs sharing an interval."""
    state = values[state_group]
    mean = query_linear(state, knot_times, times, order=order)
    d = state[0].shape[-1]
    dtype = state[0].dtype
    Qc = (jnp.asarray(qc, dtype) * jnp.eye(d, dtype=dtype)
          if jnp.ndim(qc) == 0 else jnp.asarray(qc, dtype))
    gp = wnoa if order == 2 else wnoj

    k, tau, dtk = locate(knot_times, times)
    L, S = gp.lambda_psi_coeffs(dtk, tau)
    eye = jnp.eye(d, dtype=dtype)
    A = jnp.concatenate([_kron(L, eye), _kron(S, eye)], axis=-1)  # (M, b, 2b)
    Ssupp = _pairwise_support_cov(graph, values, k, state_group, lm_group)
    Sigma = jnp.einsum("aij,acjk,clk->acil", A, Ssupp, A)

    same = k[:, None] == k[None, :]

    def pair_row(ta, dta, same_row):
        return jax.vmap(
            lambda tc, sm: _bridge_cross_coeff(gp, ta, tc, dta, sm)
        )(tau, same_row)

    Pc = jax.vmap(pair_row)(tau, dtk, same)
    Sigma = Sigma + _kron(Pc, Qc)
    # symmetrize: Sigma[a, c] must equal Sigma[c, a]^T
    Sigma = 0.5 * (Sigma + jnp.swapaxes(
        jnp.swapaxes(Sigma, 0, 1), -1, -2))
    return mean, Sigma


def _joint_support_cov(graph, values, k, state_group, lm_group):
    Sigma, cross, _ = marginals_mod.chain_joint_marginals(
        graph, values, state_group, lm_group
    )
    Sij = cross[k]
    top = jnp.concatenate([Sigma[k], Sij], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(Sij, -1, -2), Sigma[k + 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)  # (M, 2b, 2b)


def _lie_query_maps(lie, gamma_fn, interp_fn, unpack, pack,
                    values, times, knot_times, qc, state_group):
    """Shared SE(2)/SE(3) query machinery: per-query mean, support
    sensitivity A = d(interp)/d(support tangents) (forward AD at the
    retraction zero), bridge map B = blkdiag(Jr(xi_tau), Jr(xi_tau)), and
    Qc. Returns (mean, k, tau, dtk, A (M,2d,4d), B (M,2d,2d), Qc)."""
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

    xi_tau, _ = jax.vmap(gamma_fn)(*pack(Pi, wi, Pj, wj), dtk, tau)
    Jr = lie.right_jacobian(xi_tau)  # (M, d, d)
    B = jnp.zeros((*Jr.shape[:-2], 2 * d, 2 * d), dtype)
    B = B.at[..., :d, :d].set(Jr).at[..., d:, d:].set(Jr)
    return (mean_pose, mean_vel), k, tau, dtk, A, B, Qc


def _query_posterior_lie(lie, gamma_fn, interp_fn, unpack, pack,
                         graph, values, times, knot_times, qc,
                         state_group, lm_group):
    """Shared SE(2)/SE(3) posterior query: tangent covariance at tau is

        Sigma(tau) = A Sigma_supp A^T + B (P_cond (x) Qc) B^T

    first order in the bridge perturbation — the same approximation order
    the reference's Lie-group factors use (SURVEY.md §2.3)."""
    mean, k, tau, dtk, A, B, Qc = _lie_query_maps(
        lie, gamma_fn, interp_fn, unpack, pack,
        values, times, knot_times, qc, state_group)
    Ssupp = _joint_support_cov(graph, values, k, state_group, lm_group)
    Sigma_tau = A @ Ssupp @ jnp.swapaxes(A, -1, -2)

    L, S = wnoa.lambda_psi_coeffs(dtk, tau)
    Pcond = wnoa.q_coeff(tau) - S @ wnoa.phi_coeff(dtk - tau) @ wnoa.q_coeff(tau)
    Sigma_tau = Sigma_tau + B @ _kron(Pcond, Qc) @ jnp.swapaxes(B, -1, -2)
    Sigma_tau = 0.5 * (Sigma_tau + jnp.swapaxes(Sigma_tau, -1, -2))
    return mean, Sigma_tau


def _query_joint_posterior_lie(lie, gamma_fn, interp_fn, unpack, pack,
                               graph, values, times, knot_times, qc,
                               state_group, lm_group):
    """Shared SE(2)/SE(3) JOINT posterior over M query times:

        Sigma[a, c] = A_a Cov(supp_a, supp_c) A_c^T
                      + [k_a == k_c] B_a (Pcond(tau_a, tau_c) (x) Qc) B_c^T

    — arbitrary-gap support cross blocks from the selected inverse, bridge
    cross term only for queries sharing an interval (Markov). First order in
    the bridge perturbation, exact at knot times."""
    mean, k, tau, dtk, A, B, Qc = _lie_query_maps(
        lie, gamma_fn, interp_fn, unpack, pack,
        values, times, knot_times, qc, state_group)
    Ssupp = _pairwise_support_cov(graph, values, k, state_group, lm_group)
    Sigma = jnp.einsum("aij,acjk,clk->acil", A, Ssupp, A)

    same = k[:, None] == k[None, :]

    def pair_row(ta, dta, same_row):
        return jax.vmap(
            lambda tc, sm: _bridge_cross_coeff(wnoa, ta, tc, dta, sm)
        )(tau, same_row)

    Pc = jax.vmap(pair_row)(tau, dtk, same)
    bridge = jnp.einsum("aij,acjk,clk->acil", B, _kron(Pc, Qc), B)
    Sigma = Sigma + bridge
    Sigma = 0.5 * (Sigma + jnp.swapaxes(
        jnp.swapaxes(Sigma, 0, 1), -1, -2))
    return mean, Sigma


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

    return _query_posterior_lie(se2_mod, gamma_se2, interp_se2,
                                _unpack_se2, _pack_se2,
                                graph, values, times, knot_times, qc,
                                state_group, lm_group)


def query_posterior_se3(graph, values, times, knot_times, qc,
                        state_group: str = "state",
                        lm_group: Optional[str] = "landmark"):
    """SE(3) version of query_posterior_se2: ((pose=(R, t), twist),
    Sigma_tau (M, 12, 12)), tangent ordering [pose (6); twist (6)]."""
    return _query_posterior_lie(se3_mod, gamma_se3, interp_se3,
                                _unpack_se3, _pack_se3,
                                graph, values, times, knot_times, qc,
                                state_group, lm_group)


def _unpack_se2(state, k):
    T, w = state
    return T[k], w[k], T[k + 1], w[k + 1]


def _pack_se2(Pi, wi, Pj, wj):
    return (Pi, wi, Pj, wj)


def _unpack_se3(state, k):
    (R, t), w = state
    return (R[k], t[k]), w[k], (R[k + 1], t[k + 1]), w[k + 1]


def _pack_se3(Pi, wi, Pj, wj):
    return (*Pi, wi, *Pj, wj)


def query_joint_posterior_se2(graph, values, times, knot_times, qc,
                              state_group: str = "state",
                              lm_group: Optional[str] = "landmark"):
    """JOINT posterior over M query times on an SE(2) GP chain: returns
    ((pose, vel), Sigma_joint (M, M, 6, 6)) with Sigma_joint[a, c] the
    tangent-space cross-covariance Cov(state(tau_a), state(tau_c)); the
    diagonal matches query_posterior_se2. First order in the GP bridge,
    exact at knot times."""
    return _query_joint_posterior_lie(se2_mod, gamma_se2, interp_se2,
                                      _unpack_se2, _pack_se2,
                                      graph, values, times, knot_times, qc,
                                      state_group, lm_group)


def query_joint_posterior_se3(graph, values, times, knot_times, qc,
                              state_group: str = "state",
                              lm_group: Optional[str] = "landmark"):
    """SE(3) version of query_joint_posterior_se2: ((pose=(R, t), twist),
    Sigma_joint (M, M, 12, 12))."""
    return _query_joint_posterior_lie(se3_mod, gamma_se3, interp_se3,
                                      _unpack_se3, _pack_se3,
                                      graph, values, times, knot_times, qc,
                                      state_group, lm_group)
