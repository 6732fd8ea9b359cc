"""SE(3) GP pose-SLAM tests (BASELINE.json config 4): WNOA + WNOJ priors,
chi^2 parity vs the independent reference solver, odometry-drift correction
with loop closures."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose3_slam
from gpslam_tpu.solve import lm_solve

import reference_solver


@pytest.fixture(scope="module")
def se3_data():
    return synthetic.make_se3_pose_graph(
        n_states=40, seed=17, loop_closure_every=10
    )


def test_se3_wnoa_matches_reference(se3_data):
    graph, values = pose3_slam.build(se3_data, dtype=jnp.float64, prior="wnoa")
    vals, stats = lm_solve(graph, values, LMConfig())
    # guard against vacuous passes (NaN Jacobians -> every step rejected)
    assert float(stats.error) < 0.9 * float(stats.error0)
    assert bool(stats.converged)
    _, info = reference_solver.solve_reference(graph, values)
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-6)
    # estimate improves on odometry dead-reckoning
    est_t = np.asarray(vals["state"][0][1])
    err_est = np.linalg.norm(est_t - se3_data["gt_t"], axis=-1).mean()
    err_init = np.linalg.norm(
        se3_data["init_t"] - se3_data["gt_t"], axis=-1
    ).mean()
    assert err_est <= err_init * 1.05


def test_se3_wnoj_solves(se3_data):
    graph, values = pose3_slam.build(se3_data, dtype=jnp.float64, prior="wnoj")
    err0 = float(graphlib.error(graph, values))
    vals, stats = lm_solve(graph, values, LMConfig())
    assert float(stats.error) < err0
    _, info = reference_solver.solve_reference(graph, values)
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-6)


def test_se3_chain_solver_parity(se3_data):
    """WNOA SE(3) graph without loop closures fits the chain backend."""
    data = synthetic.make_se3_pose_graph(n_states=30, seed=3,
                                         loop_closure_every=0)
    from gpslam_tpu.ops import chain
    from gpslam_tpu.solve import make_dense_solver

    graph, values = pose3_slam.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph, lm_group=None)
    _, st_c = lm_solve(graph, values, LMConfig(), solver=solver)
    _, st_d = lm_solve(graph, values, LMConfig(), solver=make_dense_solver(False))
    assert float(st_c.error) == pytest.approx(float(st_d.error), rel=1e-8)


def test_se3_gp_prior_zero_on_constant_twist():
    """Constant-twist trajectory has ~zero WNOA prior residual (the SDE
    mean); sanity for the synthetic generator + factor conventions."""
    data = synthetic.make_se3_pose_graph(n_states=10, seed=1)
    # overwrite odometry-free graph at ground truth with exact twists
    data["init_R"] = data["gt_R"]
    data["init_t"] = data["gt_t"]
    data["init_vel"] = data["gt_vel"]
    graph, values = pose3_slam.build(data, dtype=jnp.float64)
    lins = graphlib.linearize(graph, values)
    for batch, lin in zip(graph.batches, lins):
        if batch.name == "gp_prior":
            # twists vary between knots, so the residual is not exactly 0,
            # but must be small compared to the whitening scale
            assert float(jnp.abs(lin.r).max()) < 5.0
