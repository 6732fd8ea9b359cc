"""Post-solve trajectory queries (reference call stack §3.4): mean
interpolation at arbitrary times + exact Laplace posterior covariance.

The load-bearing test is REFINEMENT PARITY: inserting the query time as an
actual chain knot (with the single GP prior split into two — exact by the
Markov property) must reproduce the coarse problem's queried mean and
covariance bit-for-bit up to solver tolerance.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu import marginals, query
from gpslam_tpu.config import LMConfig
from gpslam_tpu.factors import gp_priors, measurements
from gpslam_tpu.graph import GraphBuilder, manifolds
from gpslam_tpu.solve import lm_solve, make_dense_solver

RNG = np.random.default_rng(7)
QC = 0.7
D = 2


def build_chain(knot_times, meas, dtype=jnp.float64):
    """Linear-WNOA chain with knots at `knot_times` and full-state Gaussian
    priors `meas` = [(knot index, mu (2D,), sigma)]."""
    knot_times = np.asarray(knot_times, float)
    n = len(knot_times)
    b = GraphBuilder()
    b.add_group("state", manifolds.linear_state(D))
    dts = np.diff(knot_times)
    qsi = np.eye(D) / math.sqrt(QC)
    b.add_factors(
        "gp_prior", gp_priors.gp_prior_linear, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"dt": jnp.asarray(dts, dtype),
         "qc_sqrt_info": jnp.asarray(np.broadcast_to(qsi, (n - 1, D, D)),
                                     dtype)},
        rdim=2 * D,
    )
    idx = np.asarray([m[0] for m in meas], np.int32)
    mus = np.stack([m[1] for m in meas])
    sqi = np.stack([np.eye(2 * D) / m[2] for m in meas])
    b.add_factors(
        "prior", measurements.prior_linear_state, ("state",), (idx,),
        {"mu": jnp.asarray(mus, dtype), "sqrt_info": jnp.asarray(sqi, dtype)},
        rdim=2 * D,
    )
    values = {"state": (jnp.zeros((n, D), dtype), jnp.zeros((n, D), dtype))}
    return b.build(), values


COARSE_T = np.arange(7.0)
MEAS = [
    (0, np.array([0.0, 0.0, 1.0, 0.5]), 0.05),
    (2, np.array([2.1, 0.9, 1.0, 0.4]), 0.3),
    (5, np.array([4.8, 2.6, 0.8, 0.6]), 0.2),
]


@pytest.fixture(scope="module")
def coarse_solved():
    graph, values = build_chain(COARSE_T, MEAS)
    vals, st = lm_solve(graph, values, LMConfig(),
                        solver=make_dense_solver(False))
    assert bool(st.converged)
    return graph, vals


def test_tridiag_cross_matches_dense():
    n, b = 8, 4
    Dd = RNG.normal(size=(n, b, b))
    Dd = Dd @ Dd.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    U = 0.7 * RNG.normal(size=(n, b, b))
    U[-1] = 0
    Sigma, P = marginals.tridiag_selected_inverse(jnp.asarray(Dd),
                                                  jnp.asarray(U))
    cross = marginals.tridiag_cross_covariances(Sigma, P, jnp.asarray(U))
    H = np.zeros((n * b, n * b))
    for i in range(n):
        H[i*b:(i+1)*b, i*b:(i+1)*b] = Dd[i]
        if i + 1 < n:
            H[i*b:(i+1)*b, (i+1)*b:(i+2)*b] = U[i]
            H[(i+1)*b:(i+2)*b, i*b:(i+1)*b] = U[i].T
    Hinv = np.linalg.inv(H)
    for i in range(n - 1):
        np.testing.assert_allclose(
            np.asarray(cross[i]), Hinv[i*b:(i+1)*b, (i+1)*b:(i+2)*b],
            atol=1e-10,
        )


def test_query_mean_at_knots_reproduces_states(coarse_solved):
    graph, vals = coarse_solved
    kt = jnp.asarray(COARSE_T)
    x, v = query.query_linear(vals["state"], kt, kt)
    np.testing.assert_allclose(np.asarray(x), np.asarray(vals["state"][0]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vals["state"][1]),
                               atol=1e-12)


def test_query_posterior_at_knots_matches_marginals(coarse_solved):
    graph, vals = coarse_solved
    kt = jnp.asarray(COARSE_T)
    _, Sig = query.query_posterior_linear(graph, vals, kt, kt, QC,
                                          lm_group=None)
    mc = marginals.chain_marginals(graph, vals, lm_group=None)["state"]
    np.testing.assert_allclose(np.asarray(Sig), np.asarray(mc), atol=1e-9)


def test_query_refinement_parity(coarse_solved):
    """Insert tau as a real knot in a refined problem: the dense marginal
    there must equal the coarse problem's queried posterior (Markov GP)."""
    graph_c, vals_c = coarse_solved
    tau_star = 3.37
    fine_t = np.sort(np.append(COARSE_T, tau_star))
    k_new = int(np.searchsorted(fine_t, tau_star))
    meas_f = [(int(np.searchsorted(fine_t, COARSE_T[j])), m, s)
              for (j, m, s) in MEAS]
    graph_f, values_f = build_chain(fine_t, meas_f)
    vals_f, st = lm_solve(graph_f, values_f, LMConfig(),
                          solver=make_dense_solver(False))
    assert bool(st.converged)

    t_q = jnp.asarray([tau_star])
    (x_q, v_q), Sig_q = query.query_posterior_linear(
        graph_c, vals_c, t_q, jnp.asarray(COARSE_T), QC, lm_group=None
    )
    np.testing.assert_allclose(np.asarray(x_q[0]),
                               np.asarray(vals_f["state"][0][k_new]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_q[0]),
                               np.asarray(vals_f["state"][1][k_new]),
                               atol=1e-9)
    md = marginals.dense_marginals(graph_f, vals_f)["state"][k_new]
    np.testing.assert_allclose(np.asarray(Sig_q[0]), np.asarray(md),
                               atol=1e-8)


def test_query_se2_se3_knot_reproduction():
    from gpslam_tpu.lie import se2, se3

    n = 5
    kt = jnp.asarray(np.arange(float(n)))
    T = jnp.asarray(RNG.normal(size=(n, 3)) * 0.5)
    w = jnp.asarray(RNG.normal(size=(n, 3)) * 0.3)
    pose, vel = query.query_se2((T, w), kt, kt)
    # poses equal up to SE(2) local coordinates
    np.testing.assert_allclose(
        np.asarray(se2.local_coordinates(pose, T)), 0.0, atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(vel), np.asarray(w), atol=1e-10)

    xi = RNG.normal(size=(n, 6)) * 0.4
    R, t = se3.exp(jnp.asarray(xi))
    w6 = jnp.asarray(RNG.normal(size=(n, 6)) * 0.3)
    (Rq, tq), velq = query.query_se3(((R, t), w6), kt, kt)
    np.testing.assert_allclose(
        np.asarray(se3.local_coordinates(Rq, tq, R, t)), 0.0, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(velq), np.asarray(w6), atol=1e-9)


# --------------------------------------------------------------- Lie chains
def _build_se2_chain(n=12, dtype=jnp.float64, seed=2):
    """SE(2) GP chain (no loop closures): strong prior on state 0, WNOA GP
    priors, noisy odometry between consecutive poses."""
    from gpslam_tpu.factors import gp_priors as gp_f
    from gpslam_tpu.factors import measurements as meas
    from gpslam_tpu.graph import GraphBuilder, manifolds
    from gpslam_tpu.lie import se2

    rng = np.random.default_rng(seed)
    dt = 1.0
    qc = 0.4
    T_gt = np.zeros((n, 3))
    for i in range(1, n):
        T_gt[i] = np.asarray(
            se2.compose(jnp.asarray(T_gt[i - 1]),
                        jnp.asarray([1.0, 0.1, 0.15]))
        )
    b = GraphBuilder()
    b.add_group("state", manifolds.se2_state())
    b.add_factors(
        "prior", meas.prior_se2_state, ("state",),
        (np.zeros((1,), np.int32),),
        {"mu_pose": jnp.asarray(T_gt[None, 0], dtype),
         "mu_vel": jnp.asarray(np.array([[1.0, 0.1, 0.15]]), dtype),
         "sqrt_info": jnp.asarray((np.eye(6) / 0.01)[None], dtype)},
        rdim=6,
    )
    b.add_factors(
        "gp_prior", gp_f.gp_prior_se2, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"dt": jnp.full((n - 1,), dt, dtype),
         "qc_sqrt_info": jnp.asarray(
             np.broadcast_to(np.eye(3) / np.sqrt(qc), (n - 1, 3, 3)), dtype)},
        rdim=6,
    )
    z = np.stack([
        np.asarray(se2.local_coordinates(jnp.asarray(T_gt[i]),
                                         jnp.asarray(T_gt[i + 1])))
        for i in range(n - 1)
    ]) + 0.03 * rng.normal(size=(n - 1, 3))
    b.add_factors(
        "odometry", meas.between_se2, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"z": jnp.asarray(z, dtype),
         "sqrt_info": jnp.asarray(
             np.broadcast_to(np.eye(3) / 0.05, (n - 1, 3, 3)), dtype)},
        rdim=3,
    )
    init = {
        "state": (
            jnp.asarray(T_gt + 0.05 * rng.normal(size=(n, 3)), dtype),
            jnp.asarray(np.tile([1.0, 0.1, 0.15], (n, 1))
                        + 0.05 * rng.normal(size=(n, 3)), dtype),
        )
    }
    return b.build(), init, qc, dt


@pytest.fixture(scope="module")
def se2_chain_solved():
    graph, values, qc, dt = _build_se2_chain()
    vals, st = lm_solve(graph, values, LMConfig(),
                        solver=make_dense_solver(False))
    assert bool(st.converged)
    return graph, vals, qc, dt


def test_query_posterior_se2_at_knots_matches_marginals(se2_chain_solved):
    graph, vals, qc, dt = se2_chain_solved
    n = vals["state"][0].shape[0]
    kt = jnp.asarray(np.arange(n) * dt)
    (pose, vel), Sig = query.query_posterior_se2(graph, vals, kt, kt, qc,
                                                 lm_group=None)
    from gpslam_tpu.lie import se2

    np.testing.assert_allclose(
        np.asarray(se2.local_coordinates(pose, vals["state"][0])), 0.0,
        atol=1e-10,
    )
    mc = marginals.chain_marginals(graph, vals, lm_group=None)["state"]
    np.testing.assert_allclose(np.asarray(Sig), np.asarray(mc), atol=1e-9)


def test_query_posterior_se2_between_knots_spd_and_smooth(se2_chain_solved):
    graph, vals, qc, dt = se2_chain_solved
    n = vals["state"][0].shape[0]
    kt = jnp.asarray(np.arange(n) * dt)
    tq = jnp.asarray(np.linspace(0.05, (n - 1) * dt - 0.05, 41))
    _, Sig = query.query_posterior_se2(graph, vals, tq, kt, qc, lm_group=None)
    eig = np.linalg.eigvalsh(np.asarray(Sig))
    assert (eig > 0).all()
    # continuity at the knots: tau -> t_k recovers the knot marginal
    mc = np.asarray(marginals.chain_marginals(graph, vals,
                                              lm_group=None)["state"])
    eps = 1e-7
    t_near = jnp.asarray(np.arange(1, n - 1) * dt + eps)
    _, Sig_near = query.query_posterior_se2(graph, vals, t_near, kt, qc,
                                            lm_group=None)
    np.testing.assert_allclose(np.asarray(Sig_near), mc[1:-1], atol=1e-5)


def test_query_posterior_se3_at_knots_matches_marginals():
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import pose3_slam

    data = synthetic.make_se3_pose_graph(n_states=10, seed=3)
    graph, values = pose3_slam.build(data, dtype=jnp.float64)
    vals, st = lm_solve(graph, values, LMConfig(),
                        solver=make_dense_solver(False))
    n = 10
    dt = float(data["dt"])
    kt = jnp.asarray(np.arange(n) * dt)
    qc = float(data["qc"])
    ((R, t), w), Sig = query.query_posterior_se3(graph, vals, kt, kt, qc,
                                                 lm_group=None)
    from gpslam_tpu.lie import se3

    Rs, ts = vals["state"][0]
    np.testing.assert_allclose(
        np.asarray(se3.local_coordinates(R, t, Rs, ts)), 0.0, atol=1e-9
    )
    mc = marginals.chain_marginals(graph, vals, lm_group=None)["state"]
    np.testing.assert_allclose(np.asarray(Sig), np.asarray(mc), atol=1e-8)


# ----------------------------------------------------- joint (multi-time)
def test_tridiag_cross_at_matches_dense():
    """Arbitrary-gap selected-inverse blocks (incl. i > j and i == j)."""
    n, b = 7, 3
    Dd = RNG.normal(size=(n, b, b))
    Dd = Dd @ Dd.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    U = 0.6 * RNG.normal(size=(n, b, b))
    U[-1] = 0
    Sigma, P = marginals.tridiag_selected_inverse(jnp.asarray(Dd),
                                                  jnp.asarray(U))
    H = np.zeros((n * b, n * b))
    for i in range(n):
        H[i*b:(i+1)*b, i*b:(i+1)*b] = Dd[i]
        if i + 1 < n:
            H[i*b:(i+1)*b, (i+1)*b:(i+2)*b] = U[i]
            H[(i+1)*b:(i+2)*b, i*b:(i+1)*b] = U[i].T
    Hinv = np.linalg.inv(H)
    rows = np.array([0, 2, 5, 3, 4, 6, 0], np.int32)
    cols = np.array([4, 2, 1, 3, 6, 0, 1], np.int32)
    X = marginals.tridiag_cross_at(Sigma, P, jnp.asarray(U),
                                   jnp.asarray(rows), jnp.asarray(cols))
    for m, (i, j) in enumerate(zip(rows, cols)):
        np.testing.assert_allclose(
            np.asarray(X[m]), Hinv[i*b:(i+1)*b, j*b:(j+1)*b], atol=1e-10
        )


def test_joint_query_at_knots(coarse_solved):
    """times == knot times: joint diagonal == chain marginals; the (k, k+1)
    off-diagonal block == the adjacent Takahashi cross block."""
    graph, vals = coarse_solved
    kt = jnp.asarray(COARSE_T)
    _, J = query.query_joint_posterior_linear(graph, vals, kt, kt, QC,
                                              lm_group=None)
    mc = marginals.chain_marginals(graph, vals, lm_group=None)["state"]
    n = len(COARSE_T)
    for a in range(n):
        np.testing.assert_allclose(np.asarray(J[a, a]), np.asarray(mc[a]),
                                   atol=1e-9)
    _, cross, _ = marginals.chain_joint_marginals(graph, vals, lm_group=None)
    for a in range(n - 2):  # last knot clamps into the final interval
        np.testing.assert_allclose(np.asarray(J[a, a + 1]),
                                   np.asarray(cross[a]), atol=1e-9)


def _dense_joint_blocks(graph_f, vals_f, idxs, b):
    """Full-inverse cross blocks of the refined problem, dense reference."""
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.ops import dense as dense_ops

    layout, Dtot = dense_ops.tangent_layout(graph_f, vals_f)
    lins = graphlib.linearize(graph_f, vals_f)
    H, _ = dense_ops.assemble_dense(graph_f, lins, layout, Dtot, jnp.float64)
    Hinv = np.linalg.inv(np.asarray(H))
    off = layout["state"][0]
    out = np.zeros((len(idxs), len(idxs), b, b))
    for a, i in enumerate(idxs):
        for c, j in enumerate(idxs):
            out[a, c] = Hinv[off + i*b:off + (i+1)*b, off + j*b:off + (j+1)*b]
    return out


def test_joint_query_refinement_parity(coarse_solved):
    """Insert THREE query times as real knots (two sharing a coarse interval,
    one elsewhere): the refined problem's dense-inverse cross blocks must
    equal the coarse problem's joint query covariance — this exercises the
    arbitrary-gap support cross terms AND the same-interval bridge cross."""
    graph_c, vals_c = coarse_solved
    taus = np.array([1.4, 3.2, 3.6])
    fine_t = np.sort(np.append(COARSE_T, taus))
    k_new = [int(np.searchsorted(fine_t, t)) for t in taus]
    meas_f = [(int(np.searchsorted(fine_t, COARSE_T[j])), m, s)
              for (j, m, s) in MEAS]
    graph_f, values_f = build_chain(fine_t, meas_f)
    vals_f, st = lm_solve(graph_f, values_f, LMConfig(),
                          solver=make_dense_solver(False))
    assert bool(st.converged)

    _, J = query.query_joint_posterior_linear(
        graph_c, vals_c, jnp.asarray(taus), jnp.asarray(COARSE_T), QC,
        lm_group=None,
    )
    ref = _dense_joint_blocks(graph_f, vals_f, k_new, 2 * D)
    np.testing.assert_allclose(np.asarray(J), ref, atol=1e-8)


def test_joint_query_unsorted_times(coarse_solved):
    """Query times need not be sorted: the joint must be a permutation of
    the sorted-query joint."""
    graph, vals = coarse_solved
    ts = jnp.asarray([3.6, 1.4, 3.2])
    tu = jnp.asarray([1.4, 3.2, 3.6])
    _, Ju = query.query_joint_posterior_linear(graph, vals, ts,
                                               jnp.asarray(COARSE_T), QC,
                                               lm_group=None)
    _, Js = query.query_joint_posterior_linear(graph, vals, tu,
                                               jnp.asarray(COARSE_T), QC,
                                               lm_group=None)
    perm = [2, 0, 1]  # ts[a] == tu[perm[a]]
    for a in range(3):
        for c in range(3):
            np.testing.assert_allclose(np.asarray(Ju[a, c]),
                                       np.asarray(Js[perm[a], perm[c]]),
                                       atol=1e-10)


def test_joint_query_refinement_parity_wnoj():
    """Order-3 joint query, same-interval pair."""
    graph_c, values_c = _build_wnoj_chain(COARSE_T, MEAS)
    vals_c, st = lm_solve(graph_c, values_c, LMConfig(),
                          solver=make_dense_solver(False))
    assert bool(st.converged)
    taus = np.array([3.2, 3.6])
    fine_t = np.sort(np.append(COARSE_T, taus))
    k_new = [int(np.searchsorted(fine_t, t)) for t in taus]
    meas_f = [(int(np.searchsorted(fine_t, COARSE_T[j])), m, s)
              for (j, m, s) in MEAS]
    graph_f, values_f = _build_wnoj_chain(fine_t, meas_f)
    vals_f, st_f = lm_solve(graph_f, values_f, LMConfig(),
                            solver=make_dense_solver(False))
    assert bool(st_f.converged)

    _, J = query.query_joint_posterior_linear(
        graph_c, vals_c, jnp.asarray(taus), jnp.asarray(COARSE_T), QC,
        lm_group=None, order=3,
    )
    ref = _dense_joint_blocks(graph_f, vals_f, k_new, 3 * D)
    np.testing.assert_allclose(np.asarray(J), ref, atol=1e-8)


def test_joint_query_se2(se2_chain_solved):
    """SE(2) joint query: knot diagonal == chain marginals, adjacent knot
    cross == Takahashi cross, diagonal between knots == the single-time
    posterior, and the full stacked joint is SPD."""
    graph, vals, qc, dt = se2_chain_solved
    n = vals["state"][0].shape[0]
    kt = jnp.asarray(np.arange(n) * dt)

    _, Jk = query.query_joint_posterior_se2(graph, vals, kt, kt, qc,
                                            lm_group=None)
    mc = marginals.chain_marginals(graph, vals, lm_group=None)["state"]
    _, cross, _ = marginals.chain_joint_marginals(graph, vals, lm_group=None)
    for a in range(n):
        np.testing.assert_allclose(np.asarray(Jk[a, a]), np.asarray(mc[a]),
                                   atol=1e-9)
    for a in range(n - 2):
        np.testing.assert_allclose(np.asarray(Jk[a, a + 1]),
                                   np.asarray(cross[a]), atol=1e-9)

    tq = jnp.asarray([0.4, 2.3, 2.7, 7.9])
    (pose, vel), J = query.query_joint_posterior_se2(graph, vals, tq, kt, qc,
                                                     lm_group=None)
    _, Sd = query.query_posterior_se2(graph, vals, tq, kt, qc, lm_group=None)
    for a in range(4):
        np.testing.assert_allclose(np.asarray(J[a, a]), np.asarray(Sd[a]),
                                   atol=1e-10)
    big = np.asarray(J).transpose(0, 2, 1, 3).reshape(4 * 6, 4 * 6)
    eig = np.linalg.eigvalsh(big)
    assert (eig > 0).all(), eig


def test_joint_query_se3_smoke():
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import pose3_slam

    data = synthetic.make_se3_pose_graph(n_states=8, seed=3)
    graph, values = pose3_slam.build(data, dtype=jnp.float64)
    vals, st = lm_solve(graph, values, LMConfig(),
                        solver=make_dense_solver(False))
    dt = float(data["dt"])
    kt = jnp.asarray(np.arange(8) * dt)
    qc = float(data["qc"])
    tq = kt[1:4]
    _, J = query.query_joint_posterior_se3(graph, vals, tq, kt, qc,
                                           lm_group=None)
    mc = marginals.chain_marginals(graph, vals, lm_group=None)["state"]
    for a in range(3):
        np.testing.assert_allclose(np.asarray(J[a, a]),
                                   np.asarray(mc[1 + a]), atol=1e-8)
    big = np.asarray(J).transpose(0, 2, 1, 3).reshape(3 * 12, 3 * 12)
    assert (np.linalg.eigvalsh(big) > 0).all()


# ------------------------------------------------------------------ WNOJ
def _build_wnoj_chain(knot_times, meas, dtype=jnp.float64):
    knot_times = np.asarray(knot_times, float)
    n = len(knot_times)
    b = GraphBuilder()
    b.add_group("state", manifolds.linear_wnoj_state(D))
    qsi = np.eye(D) / math.sqrt(QC)
    b.add_factors(
        "gp_prior", gp_priors.gp_prior_linear_wnoj, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"dt": jnp.asarray(np.diff(knot_times), dtype),
         "qc_sqrt_info": jnp.asarray(np.broadcast_to(qsi, (n - 1, D, D)),
                                     dtype)},
        rdim=3 * D,
    )
    idx = np.asarray([m[0] for m in meas], np.int32)
    mus = np.stack([np.concatenate([m[1], np.zeros(D)]) for m in meas])
    sqi = np.stack([np.eye(3 * D) / m[2] for m in meas])
    b.add_factors(
        "prior", measurements.prior_linear_state, ("state",), (idx,),
        {"mu": jnp.asarray(mus, dtype), "sqrt_info": jnp.asarray(sqi, dtype)},
        rdim=3 * D,
    )
    z = jnp.zeros((n, D), dtype)
    return b.build(), {"state": (z, z, z)}


def test_query_refinement_parity_wnoj():
    """Order-3 (WNOJ) posterior query: same refinement-parity construction
    as the WNOA test."""
    tau_star = 3.37
    graph_c, values_c = _build_wnoj_chain(COARSE_T, MEAS)
    vals_c, st = lm_solve(graph_c, values_c, LMConfig(),
                          solver=make_dense_solver(False))
    assert bool(st.converged)
    fine_t = np.sort(np.append(COARSE_T, tau_star))
    k_new = int(np.searchsorted(fine_t, tau_star))
    meas_f = [(int(np.searchsorted(fine_t, COARSE_T[j])), m, s)
              for (j, m, s) in MEAS]
    graph_f, values_f = _build_wnoj_chain(fine_t, meas_f)
    vals_f, st_f = lm_solve(graph_f, values_f, LMConfig(),
                            solver=make_dense_solver(False))
    assert bool(st_f.converged)

    t_q = jnp.asarray([tau_star])
    (x_q, v_q, a_q), Sig_q = query.query_posterior_linear(
        graph_c, vals_c, t_q, jnp.asarray(COARSE_T), QC, lm_group=None,
        order=3,
    )
    np.testing.assert_allclose(np.asarray(x_q[0]),
                               np.asarray(vals_f["state"][0][k_new]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(a_q[0]),
                               np.asarray(vals_f["state"][2][k_new]),
                               atol=1e-9)
    md = marginals.dense_marginals(graph_f, vals_f)["state"][k_new]
    np.testing.assert_allclose(np.asarray(Sig_q[0]), np.asarray(md),
                               atol=1e-8)
