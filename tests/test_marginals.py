"""Marginal covariance tests: selected-inverse vs dense inverse parity
(reference behavior: GTSAM Marginals, SURVEY.md §3.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu import marginals
from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.solve import lm_solve

RNG = np.random.default_rng(11)


def test_tridiag_selected_inverse_matches_dense():
    n, b = 9, 3
    D = RNG.normal(size=(n, b, b))
    D = D @ D.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    U = 0.8 * RNG.normal(size=(n, b, b))
    U[-1] = 0
    Sigma, _ = marginals.tridiag_selected_inverse(jnp.asarray(D), jnp.asarray(U))
    H = np.zeros((n * b, n * b))
    for i in range(n):
        H[i*b:(i+1)*b, i*b:(i+1)*b] = D[i]
        if i + 1 < n:
            H[i*b:(i+1)*b, (i+1)*b:(i+2)*b] = U[i]
            H[(i+1)*b:(i+2)*b, i*b:(i+1)*b] = U[i].T
    Hinv = np.linalg.inv(H)
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(Sigma[i]), Hinv[i*b:(i+1)*b, i*b:(i+1)*b], atol=1e-10
        )


@pytest.fixture(scope="module")
def solved_problem():
    data = synthetic.make_linear2d_range_slam(n_states=25, seed=13)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    vals, _ = lm_solve(graph, values, LMConfig(), solver=solver)
    return graph, vals


def test_chain_marginals_match_dense(solved_problem):
    graph, vals = solved_problem
    mc = marginals.chain_marginals(graph, vals)
    md = marginals.dense_marginals(graph, vals)
    np.testing.assert_allclose(
        np.asarray(mc["state"]), np.asarray(md["state"]), rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(mc["landmark"]), np.asarray(md["landmark"]), rtol=1e-6,
        atol=1e-10,
    )


def test_marginals_are_spd(solved_problem):
    graph, vals = solved_problem
    mc = marginals.chain_marginals(graph, vals)
    for g, S in mc.items():
        S = np.asarray(S)
        np.testing.assert_allclose(S, S.swapaxes(-1, -2), atol=1e-9)
        eig = np.linalg.eigvalsh(S)
        assert np.all(eig > 0), f"{g} marginal not PD"


def test_anchored_state_has_smallest_uncertainty(solved_problem):
    graph, vals = solved_problem
    mc = marginals.chain_marginals(graph, vals)
    tr = np.trace(np.asarray(mc["state"]), axis1=-2, axis2=-1)
    # state 0 carries the strong prior: it must be the most certain
    assert np.argmin(tr) == 0


# ---------------------------------------------------------------- supernodal
# Takahashi selected inverse over the supernodal level schedules (S12 for
# general graphs: loop closures, mixed block sizes)


@pytest.fixture(scope="module")
def lc_solved():
    from gpslam_tpu.models import pose2_slam
    from gpslam_tpu.ops.supernodal import SupernodalSolver

    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    sn = SupernodalSolver(graph, values)
    vals, _ = lm_solve(graph, values, LMConfig(), solver=sn.solver)
    return graph, vals


def test_supernodal_marginals_match_dense(lc_solved):
    graph, vals = lc_solved
    ms = marginals.supernodal_marginals(graph, vals, amalgamate=False)
    md = marginals.dense_marginals(graph, vals)
    for g in md:
        np.testing.assert_allclose(
            np.asarray(ms[g]), np.asarray(md[g]), atol=1e-8, err_msg=g
        )


def test_amalgamated_marginals_match_dense(lc_solved):
    graph, vals = lc_solved
    ms = marginals.supernodal_marginals(graph, vals, amalgamate=True, w_max=3)
    md = marginals.dense_marginals(graph, vals)
    for g in md:
        np.testing.assert_allclose(
            np.asarray(ms[g]), np.asarray(md[g]), atol=1e-8, err_msg=g
        )


def test_supernodal_marginals_mixed_blocks():
    """Pose (dim 4) + landmark (dim 2) groups through block padding."""
    data = synthetic.make_linear2d_range_slam(n_states=18, seed=5)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    vals, _ = lm_solve(graph, values, LMConfig(), solver=solver)
    ms = marginals.supernodal_marginals(graph, vals, amalgamate=True)
    md = marginals.dense_marginals(graph, vals)
    for g in md:
        np.testing.assert_allclose(
            np.asarray(ms[g]), np.asarray(md[g]), atol=1e-8, err_msg=g
        )


def test_auto_marginals_dispatch(lc_solved, solved_problem):
    # chain problem -> chain recurrences
    graph_c, vals_c = solved_problem
    ma = marginals.auto_marginals(graph_c, vals_c)
    mc = marginals.chain_marginals(graph_c, vals_c)
    for g in mc:
        np.testing.assert_allclose(np.asarray(ma[g]), np.asarray(mc[g]),
                                   atol=1e-12)
    # loop-closure pose graph (240-dim tangent) -> dense (tiny) per heuristic;
    # must agree with the supernodal path regardless of which is chosen
    graph_l, vals_l = lc_solved
    ml = marginals.auto_marginals(graph_l, vals_l)
    ms = marginals.supernodal_marginals(graph_l, vals_l)
    for g in ms:
        np.testing.assert_allclose(np.asarray(ml[g]), np.asarray(ms[g]),
                                   atol=1e-8)


def test_supernodal_joint_marginals_match_dense(lc_solved):
    """In-pattern pairwise joints (GTSAM jointMarginalCovariance) on a
    loop-closure pose graph: consecutive pairs AND the loop-closure pair
    itself vs the dense inverse."""
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.ops import dense as dense_ops
    from gpslam_tpu.ops.supernodal import SupernodalSolver

    graph, vals = lc_solved
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    li, lj = int(data["lc_i"][0]), int(data["lc_j"][0])
    pairs = [(("state", 5), ("state", 6)),
             (("state", li), ("state", lj)),
             (("state", 20), ("state", 19))]  # reversed order too
    J = marginals.supernodal_joint_marginals(graph, vals, pairs)

    layout, Dtot = dense_ops.tangent_layout(graph, vals)
    lins = graphlib.linearize(graph, vals)
    H, _ = dense_ops.assemble_dense(graph, lins, layout, Dtot, jnp.float64)
    Hinv = np.linalg.inv(np.asarray(H))
    off, d = layout["state"]

    def blk(i, j):
        return Hinv[off + i*d:off + (i+1)*d, off + j*d:off + (j+1)*d]

    for m, ((_, i), (_, j)) in enumerate(pairs):
        ref = np.block([[blk(i, i), blk(i, j)], [blk(j, i), blk(j, j)]])
        np.testing.assert_allclose(np.asarray(J[m]), ref, atol=1e-8,
                                   err_msg=str(pairs[m]))

    # out-of-pattern pair (found dynamically) must raise with guidance
    sn = SupernodalSolver(graph, vals)
    n = vals["state"][0].shape[0]
    missing = None
    for i in range(n):
        for j in range(i + 2, n):
            pi, pj = int(sn.pos[i]), int(sn.pos[j])
            if pi != pj and (max(pi, pj), min(pi, pj)) not in sn.off_id:
                missing = (i, j)
                break
        if missing:
            break
    if missing is not None:
        with pytest.raises(ValueError, match="outside the fill pattern"):
            marginals.supernodal_joint_marginals(
                graph, vals, [(("state", missing[0]), ("state", missing[1]))]
            )


def test_amalgamated_joint_marginals_match_dense(lc_solved):
    """Passing an AmalgamatedSupernodalSolver (the default solver
    supernodal_marginals builds) to supernodal_joint_marginals must extract
    joints from the PANEL storage correctly — the silent-corruption case
    before the override existed (ADVICE.md r1, medium)."""
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.ops import dense as dense_ops
    from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver

    graph, vals = lc_solved
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    li, lj = int(data["lc_i"][0]), int(data["lc_j"][0])
    pairs = [(("state", 5), ("state", 6)),     # likely same supernode
             (("state", li), ("state", lj)),   # loop closure, across panels
             (("state", 20), ("state", 19)),   # reversed order
             (("state", 7), ("state", 7))]     # same variable twice
    solver = AmalgamatedSupernodalSolver(graph, vals, w_max=3)
    J = marginals.supernodal_joint_marginals(graph, vals, pairs,
                                             solver=solver)

    layout, Dtot = dense_ops.tangent_layout(graph, vals)
    lins = graphlib.linearize(graph, vals)
    H, _ = dense_ops.assemble_dense(graph, lins, layout, Dtot, jnp.float64)
    Hinv = np.linalg.inv(np.asarray(H))
    off, d = layout["state"]

    def blk(i, j):
        return Hinv[off + i*d:off + (i+1)*d, off + j*d:off + (j+1)*d]

    for m, ((_, i), (_, j)) in enumerate(pairs):
        ref = np.block([[blk(i, i), blk(i, j)], [blk(j, i), blk(j, j)]])
        np.testing.assert_allclose(np.asarray(J[m]), ref, atol=1e-8,
                                   err_msg=str(pairs[m]))


def test_supernodal_joint_same_variable_degrades_to_marginal(lc_solved):
    """pa == pb returns [[S, S], [S, S]] instead of raising (GTSAM
    jointMarginalCovariance repeated-key semantics; ADVICE.md r1, low)."""
    graph, vals = lc_solved
    (J,) = marginals.supernodal_joint_marginals(
        graph, vals, [(("state", 9), ("state", 9))]
    )
    md = marginals.dense_marginals(graph, vals)
    S = np.asarray(md["state"][9])
    np.testing.assert_allclose(np.asarray(J), np.block([[S, S], [S, S]]),
                               atol=1e-8)
