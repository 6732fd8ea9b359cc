"""Full time-sharded LM (P4): trajectory chunks + halo exchange + SPIKE
solve vs the single-device chain backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.parallel import make_mesh
from gpslam_tpu.parallel.time_shard import lm_solve_time_sharded
from gpslam_tpu.solve import lm_solve


def test_time_sharded_lm_matches_single_device():
    data = synthetic.make_linear2d_range_slam(
        n_states=64, ranges_per_interval=0.5, seed=12
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    mesh = make_mesh(4, axis_name="time")
    vals_sh, st_sh = lm_solve_time_sharded(
        graph, values, mesh, LMConfig(max_iterations=30)
    )
    solver = chain.make_chain_solver(graph)
    vals_1, st_1 = lm_solve(graph, values, LMConfig(max_iterations=30),
                            solver=solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-3)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"][0]), np.asarray(vals_1["state"][0]),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(vals_sh["landmark"]), np.asarray(vals_1["landmark"]),
        atol=5e-3,
    )


def test_time_sharded_pads_arbitrary_length():
    """n_states not divisible by n_dev: padded states are identity-anchored
    and trimmed back; result matches the single-device chain solve."""
    data = synthetic.make_linear2d_range_slam(
        n_states=61, ranges_per_interval=0.5, seed=1
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    mesh = make_mesh(4, axis_name="time")
    vals_sh, st_sh = lm_solve_time_sharded(
        graph, values, mesh, LMConfig(max_iterations=30)
    )
    assert vals_sh["state"][0].shape[0] == 61
    solver = chain.make_chain_solver(graph)
    vals_1, st_1 = lm_solve(graph, values, LMConfig(max_iterations=30),
                            solver=solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-3)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"][0]), np.asarray(vals_1["state"][0]),
        atol=5e-3,
    )


def test_time_sharded_short_chain_pads_to_min_chunk():
    """n_states < 4*n_dev forces chunk-length padding (m = 4)."""
    data = synthetic.make_linear2d_range_slam(
        n_states=13, ranges_per_interval=0.5, seed=5
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    mesh = make_mesh(4, axis_name="time")
    vals_sh, st_sh = lm_solve_time_sharded(
        graph, values, mesh, LMConfig(max_iterations=30)
    )
    assert vals_sh["state"][0].shape[0] == 13
    solver = chain.make_chain_solver(graph)
    vals_1, st_1 = lm_solve(graph, values, LMConfig(max_iterations=30),
                            solver=solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-3)


def test_time_sharded_se3_wnoj():
    """SE(3) WNOJ pose graph (b=18) through the time-sharded LM, with a
    non-divisible length exercising the padding path."""
    from gpslam_tpu.models import pose3_slam

    data = synthetic.make_se3_pose_graph(n_states=30, seed=3)
    graph, values = pose3_slam.build(data, dtype=jnp.float32, prior="wnoj")
    mesh = make_mesh(4, axis_name="time")
    vals_sh, st_sh = lm_solve_time_sharded(
        graph, values, mesh, LMConfig(max_iterations=30), lm_group=None
    )
    solver = chain.make_chain_solver(graph, lm_group=None)
    vals_1, st_1 = lm_solve(graph, values, LMConfig(max_iterations=30),
                            solver=solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-3)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"][0][0]), np.asarray(vals_1["state"][0][0]),
        atol=5e-3,
    )
