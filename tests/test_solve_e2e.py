"""End-to-end solves on the BASELINE.json config-1/2 structures, with
chi^2-parity against the independent NumPy reference solver (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import GNConfig, LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d, pose2_slam
from gpslam_tpu.solve import gn_solve, lm_solve

import reference_solver


@pytest.fixture(scope="module")
def linear_problem():
    data = synthetic.make_linear2d_range_slam(n_states=30, seed=3)
    return data


@pytest.fixture(scope="module")
def se2_problem():
    # long enough to revisit cells and generate loop closures
    data = synthetic.make_se2_pose_graph(n_states=120, seed=4)
    assert data["lc_i"].shape[0] > 0, "fixture should contain loop closures"
    return data


def test_linear2d_lm_converges_and_matches_reference(linear_problem):
    graph, values = linear2d.build(linear_problem, dtype=jnp.float64)
    err0 = float(graphlib.error(graph, values))
    vals_ours, stats = lm_solve(graph, values, LMConfig())
    assert float(stats.error) < err0 * 0.1, "LM must reduce error a lot"

    vals_ref, info = reference_solver.solve_reference(graph, values)
    # same graph, same math, independent assembly/solve/loop -> tight parity
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-6)


def test_linear2d_recovers_truth(linear_problem):
    graph, values = linear2d.build(linear_problem, dtype=jnp.float64)
    vals, stats = lm_solve(graph, values, LMConfig())
    pos = np.asarray(vals["state"][0])
    gt = linear_problem["gt_pos"]
    rmse_init = np.sqrt(((linear_problem["init_pos"] - gt) ** 2).sum(-1).mean())
    rmse = np.sqrt(((pos - gt) ** 2).sum(-1).mean())
    assert rmse < 0.5 * rmse_init, (rmse, rmse_init)


def test_linear2d_f32_chi2_within_1pct(linear_problem):
    """The BASELINE.json correctness criterion: f32 chi^2 within 1% of f64."""
    graph64, values64 = linear2d.build(linear_problem, dtype=jnp.float64)
    _, stats64 = lm_solve(graph64, values64, LMConfig())
    graph32, values32 = linear2d.build(linear_problem, dtype=jnp.float32)
    _, stats32 = lm_solve(graph32, values32, LMConfig())
    assert float(stats32.error) == pytest.approx(float(stats64.error), rel=0.01)


def test_se2_lm_matches_reference(se2_problem):
    graph, values = pose2_slam.build(se2_problem, dtype=jnp.float64)
    vals_ours, stats = lm_solve(graph, values, LMConfig())
    vals_ref, info = reference_solver.solve_reference(graph, values)
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-6)
    # MAP optimality: the estimate's graph error must beat (or match) the
    # error at the ground-truth configuration
    gt_values = {
        "state": (
            jnp.asarray(se2_problem["gt_pose"]),
            jnp.asarray(se2_problem["gt_vel"]),
        )
    }
    assert float(stats.error) <= float(graphlib.error(graph, gt_values)) * 1.001


def test_gn_on_purely_linear_graph():
    # with no range factors every residual is linear, so one GN step reaches
    # the global optimum; GN, LM, and the reference must agree tightly
    data = synthetic.make_linear2d_range_slam(
        n_states=30, ranges_per_interval=0.0, seed=7
    )
    graph, values = linear2d.build(data, dtype=jnp.float64)
    vals, stats = gn_solve(graph, values, GNConfig(max_iterations=5))
    _, info = reference_solver.solve_reference(graph, values)
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-8)
    assert int(stats.iterations) <= 3


def test_lm_solve_jits(linear_problem):
    graph, values = linear2d.build(linear_problem, dtype=jnp.float32)
    solve = jax.jit(lambda g, v: lm_solve(g, v, LMConfig(max_iterations=30)))
    vals, stats = solve(graph, values)
    vals2, stats2 = lm_solve(graph, values, LMConfig(max_iterations=30))
    np.testing.assert_allclose(
        float(stats.error), float(stats2.error), rtol=1e-5
    )


def test_error_history_monotone(linear_problem):
    graph, values = linear2d.build(linear_problem, dtype=jnp.float64)
    _, stats = lm_solve(graph, values, LMConfig())
    hist = np.asarray(stats.error_history)
    hist = hist[np.isfinite(hist)]
    assert len(hist) >= 1
    assert np.all(np.diff(hist) <= 1e-9), "accepted-error history must not increase"


def test_auto_solver_selection():
    from gpslam_tpu.solve import auto_solver

    # chain-structured -> chain backend, matches explicit chain solve
    data = synthetic.make_linear2d_range_slam(n_states=30, seed=3)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    sol = auto_solver(graph, values)
    _, st_a = lm_solve(graph, values, LMConfig(), solver=sol)
    from gpslam_tpu.ops import chain

    _, st_c = lm_solve(graph, values, LMConfig(),
                       solver=chain.make_chain_solver(graph))
    assert float(st_a.error) == pytest.approx(float(st_c.error), rel=1e-10)

    # loop closures -> non-chain backend still solves
    d2 = synthetic.make_se2_pose_graph(n_states=50, seed=4)
    g2, v2 = pose2_slam.build(d2, dtype=jnp.float64)
    sol2 = auto_solver(g2, v2, lm_group=None)
    _, st2 = lm_solve(g2, v2, LMConfig(), solver=sol2)
    assert bool(st2.converged)


def test_linear_wnoj_model(linear_problem):
    """Config-2 structure with the WNOJ (constant-acceleration) prior."""
    graph, values = linear2d.build(linear_problem, dtype=jnp.float64,
                                   prior="wnoj")
    vals, stats = lm_solve(graph, values, LMConfig())
    assert bool(stats.converged)
    _, info = reference_solver.solve_reference(graph, values)
    assert float(stats.error) == pytest.approx(info["chi2"], rel=1e-6)
    # chain backend handles the 6-dim WNOJ nodes too
    from gpslam_tpu.ops import chain

    solver = chain.make_chain_solver(graph)
    _, st_c = lm_solve(graph, values, LMConfig(), solver=solver)
    assert float(st_c.error) == pytest.approx(float(stats.error), rel=1e-8)
