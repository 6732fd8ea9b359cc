"""Config-3 workload: SE(2) landmark SLAM with bearing-range factors and
marginal covariance recovery (BASELINE.json config 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu import marginals
from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops import chain
from gpslam_tpu.solve import lm_solve

import reference_solver


@pytest.fixture(scope="module")
def problem():
    data = synthetic.make_se2_landmark_slam(n_states=60, n_landmarks=8, seed=23)
    assert data["br_i"].shape[0] > 50
    return data


def test_bearing_range_slam_solves_and_matches_reference(problem):
    graph, values = pose2_slam.build_landmark_slam(problem, dtype=jnp.float64)
    vals, stats = lm_solve(graph, values, LMConfig())
    assert float(stats.error) < 0.5 * float(stats.error0)
    assert bool(stats.converged)
    _, info = reference_solver.solve_reference(graph, values)
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-6)
    # landmarks recovered well (bearing+range is very informative)
    lm_err = np.linalg.norm(
        np.asarray(vals["landmark"]) - problem["landmarks_gt"], axis=-1
    )
    lm_err_init = np.linalg.norm(
        problem["init_landmarks"] - problem["landmarks_gt"], axis=-1
    )
    assert lm_err.mean() < lm_err_init.mean()


def test_bearing_range_chain_solver_parity(problem):
    graph, values = pose2_slam.build_landmark_slam(problem, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    _, st_c = lm_solve(graph, values, LMConfig(), solver=solver)
    from gpslam_tpu.solve import make_dense_solver

    _, st_d = lm_solve(graph, values, LMConfig(), solver=make_dense_solver(False))
    assert float(st_c.error) == pytest.approx(float(st_d.error), rel=1e-8)


def test_marginal_recovery(problem):
    """Config 3's 'marginal covariance recovery': chain marginals == dense."""
    graph, values = pose2_slam.build_landmark_slam(problem, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    vals, _ = lm_solve(graph, values, LMConfig(), solver=solver)
    mc = marginals.chain_marginals(graph, vals)
    md = marginals.dense_marginals(graph, vals)
    np.testing.assert_allclose(
        np.asarray(mc["state"]), np.asarray(md["state"]), rtol=1e-5, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(mc["landmark"]), np.asarray(md["landmark"]), rtol=1e-5,
        atol=1e-10,
    )
    # frequently-observed landmarks should be better localized than the
    # weak-prior-only baseline sigma (100)
    tr = np.trace(np.asarray(mc["landmark"]), axis1=-2, axis2=-1)
    assert np.all(tr < 1.0)


def test_joint_marginal_covariance(problem):
    """GTSAM jointMarginalCovariance parity: full joint over an arbitrary
    state subset (gaps + unsorted) vs the dense inverse, WITH the landmark
    arrowhead correction in play."""
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.ops import dense as dense_ops

    graph, values = pose2_slam.build_landmark_slam(problem, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    vals, _ = lm_solve(graph, values, LMConfig(), solver=solver)

    idx = np.array([3, 41, 7, 22], np.int32)
    J = marginals.joint_marginal_covariance(graph, vals, jnp.asarray(idx))

    layout, Dtot = dense_ops.tangent_layout(graph, vals)
    lins = graphlib.linearize(graph, vals)
    H, _ = dense_ops.assemble_dense(graph, lins, layout, Dtot, jnp.float64)
    Hinv = np.linalg.inv(np.asarray(H))
    off, b = layout["state"]
    for a, i in enumerate(idx):
        for c, j in enumerate(idx):
            np.testing.assert_allclose(
                np.asarray(J[a, c]),
                Hinv[off + i*b:off + (i+1)*b, off + j*b:off + (j+1)*b],
                rtol=1e-5, atol=1e-10,
            )
