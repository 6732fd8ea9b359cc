"""Factor-sharded LM on the 8-device CPU mesh (SURVEY.md §4: collectives are
real, transport simulated) + vmapped multi-seed solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.parallel import (
    lm_solve_multiseed,
    lm_solve_sharded,
    make_mesh,
    pad_graph,
)
from gpslam_tpu.solve import lm_solve


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_pad_graph_preserves_solution():
    data = synthetic.make_linear2d_range_slam(n_states=30, seed=3)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    gp = pad_graph(graph, 8)
    for b, bp in zip(graph.batches, gp.batches):
        assert bp.size % 8 == 0
        assert bp.size >= b.size
    from gpslam_tpu.graph import graph as graphlib

    np.testing.assert_allclose(
        float(graphlib.error(gp, values)),
        float(graphlib.error(graph, values)),
        rtol=1e-12,
    )
    # solve parity padded vs unpadded
    solver_p = chain.make_chain_solver(gp)
    solver_u = chain.make_chain_solver(graph)
    _, sp = lm_solve(gp, values, LMConfig(), solver=solver_p)
    _, su = lm_solve(graph, values, LMConfig(), solver=solver_u)
    assert float(sp.error) == pytest.approx(float(su.error), rel=1e-10)


def test_sharded_lm_matches_single_device():
    data = synthetic.make_linear2d_range_slam(n_states=50, seed=8)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    mesh = make_mesh(8)
    vals_sh, stats_sh = lm_solve_sharded(graph, values, mesh, LMConfig())
    solver = chain.make_chain_solver(graph)
    vals_1, stats_1 = lm_solve(graph, values, LMConfig(), solver=solver)
    assert float(stats_sh.error) == pytest.approx(float(stats_1.error), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"][0]), np.asarray(vals_1["state"][0]), atol=1e-3
    )


def test_sharded_lm_no_landmark_group():
    from gpslam_tpu.models import pose2_slam

    data = synthetic.make_se2_pose_graph(n_states=40, seed=5, loop_closure_prob=0.0)
    data["lc_i"] = np.zeros((0,), np.int64)
    data["lc_j"] = np.zeros((0,), np.int64)
    data["lc_z"] = np.zeros((0, 3))
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    mesh = make_mesh(4)
    vals_sh, stats_sh = lm_solve_sharded(
        graph, values, mesh, LMConfig(), lm_group=None
    )
    solver = chain.make_chain_solver(graph, lm_group=None)
    _, stats_1 = lm_solve(graph, values, LMConfig(), solver=solver)
    assert float(stats_sh.error) == pytest.approx(float(stats_1.error), rel=1e-4)


def test_multiseed_vmap():
    data = synthetic.make_linear2d_range_slam(n_states=25, seed=2)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    solver = chain.make_chain_solver(graph)
    # 4 seeds: jitter the init differently per seed
    key = jax.random.PRNGKey(0)
    seeds = 4

    def jitter(v, k):
        leaves, treedef = jax.tree_util.tree_flatten(v)
        ks = jax.random.split(k, len(leaves))
        out = [
            l[None] + 0.1 * jax.random.normal(kk, (seeds, *l.shape), l.dtype)
            for l, kk in zip(leaves, ks)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)

    values_b = jitter(values, key)
    vals, stats = lm_solve_multiseed(graph, values_b, LMConfig(max_iterations=40),
                                     solver=solver)
    errs = np.asarray(stats.error)
    assert errs.shape == (seeds,)
    assert np.all(np.isfinite(errs))
    # all seeds should land in the same basin on this benign problem
    assert errs.max() / errs.min() < 1.5
