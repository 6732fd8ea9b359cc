"""Amalgamated (junction-tree) supernodal solver: parity vs the per-column
supernodal solver and the dense backend; level-count reduction."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver
from gpslam_tpu.ops.supernodal import SupernodalSolver
from gpslam_tpu.solve import lm_solve, make_dense_solver


@pytest.fixture(scope="module")
def lc_problem():
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    return pose2_slam.build(data, dtype=jnp.float64)


@pytest.mark.parametrize("w_max", [1, 3, 4, 8])
def test_linear_solve_matches_dense(lc_problem, w_max):
    graph, values = lc_problem
    am = AmalgamatedSupernodalSolver(graph, values, w_max=w_max)
    lins = graphlib.linearize(graph, values)
    lam = jnp.asarray(0.05, jnp.float64)
    d_am = am.solver(graph, values, lins, lam)
    d_dn = make_dense_solver(False)(graph, values, lins, lam)
    np.testing.assert_allclose(
        np.asarray(d_am["state"]), np.asarray(d_dn["state"]), atol=1e-8
    )


def test_fewer_levels_than_per_column(lc_problem):
    graph, values = lc_problem
    sn = SupernodalSolver(graph, values)
    am = AmalgamatedSupernodalSolver(graph, values, w_max=8)
    assert len(am.levels) < len(sn.levels) / 2, (
        len(am.levels), len(sn.levels))


def test_full_lm_matches_supernodal(lc_problem):
    graph, values = lc_problem
    am = AmalgamatedSupernodalSolver(graph, values, w_max=4)
    sn = SupernodalSolver(graph, values)
    _, st_am = lm_solve(graph, values, LMConfig(), solver=am.solver)
    _, st_sn = lm_solve(graph, values, LMConfig(), solver=sn.solver)
    assert float(st_am.error) == pytest.approx(float(st_sn.error), rel=1e-8)


def test_mixed_block_sizes_landmarks():
    data = synthetic.make_linear2d_range_slam(n_states=24, seed=1)
    from gpslam_tpu.models import linear2d

    graph, values = linear2d.build(data, dtype=jnp.float64)
    am = AmalgamatedSupernodalSolver(graph, values, w_max=4)
    lins = graphlib.linearize(graph, values)
    lam = jnp.asarray(0.02, jnp.float64)
    d_am = am.solver(graph, values, lins, lam)
    d_dn = make_dense_solver(False)(graph, values, lins, lam)
    for g in d_dn:
        np.testing.assert_allclose(
            np.asarray(d_am[g]), np.asarray(d_dn[g]), atol=1e-8
        )
