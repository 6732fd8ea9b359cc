"""General supernodal sparse Cholesky backend: parity vs dense on
loop-closure pose graphs (the S9 general path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops import dense as dense_ops
from gpslam_tpu.ops.supernodal import SupernodalSolver
from gpslam_tpu.solve import lm_solve, make_dense_solver


@pytest.fixture(scope="module")
def lc_problem():
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    return pose2_slam.build(data, dtype=jnp.float64)


def test_linear_solve_matches_dense(lc_problem):
    graph, values = lc_problem
    sn = SupernodalSolver(graph, values)
    lins = graphlib.linearize(graph, values)
    lam = jnp.asarray(0.05, jnp.float64)
    d_sn = sn.solver(graph, values, lins, lam)
    d_dn = make_dense_solver(False)(graph, values, lins, lam)
    np.testing.assert_allclose(
        np.asarray(d_sn["state"]), np.asarray(d_dn["state"]), atol=1e-8
    )


def test_full_lm_matches_dense(lc_problem):
    graph, values = lc_problem
    sn = SupernodalSolver(graph, values)
    _, st_sn = lm_solve(graph, values, LMConfig(), solver=sn.solver)
    _, st_dn = lm_solve(graph, values, LMConfig(),
                        solver=make_dense_solver(False))
    assert float(st_sn.error) == pytest.approx(float(st_dn.error), rel=1e-8)


def test_mixed_block_sizes_match_dense():
    """Multi-group (state dim 4 + landmark dim 2) via block padding."""
    data = synthetic.make_linear2d_range_slam(n_states=20, seed=1)
    from gpslam_tpu.models import linear2d

    graph, values = linear2d.build(data, dtype=jnp.float64)
    sn = SupernodalSolver(graph, values)
    lins = graphlib.linearize(graph, values)
    lam = jnp.asarray(0.01, jnp.float64)
    d_sn = sn.solver(graph, values, lins, lam)
    d_dn = make_dense_solver(False)(graph, values, lins, lam)
    for k in d_dn:
        np.testing.assert_allclose(
            np.asarray(d_sn[k]), np.asarray(d_dn[k]), atol=1e-8, err_msg=k
        )


def test_mixed_block_full_lm_matches_dense():
    data = synthetic.make_linear2d_range_slam(n_states=25, seed=3)
    from gpslam_tpu.models import linear2d

    graph, values = linear2d.build(data, dtype=jnp.float64)
    sn = SupernodalSolver(graph, values)
    _, st_sn = lm_solve(graph, values, LMConfig(), solver=sn.solver)
    _, st_dn = lm_solve(graph, values, LMConfig(),
                        solver=make_dense_solver(False))
    assert float(st_sn.error) == pytest.approx(float(st_dn.error), rel=1e-8)
