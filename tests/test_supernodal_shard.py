"""Supernode-sharded Cholesky over the 8-device CPU mesh (SURVEY.md §2.4 P2):
parity of the sharded factorization + full sharded LM vs the single-device
supernodal solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops.supernodal import SupernodalSolver
from gpslam_tpu.parallel import (
    lm_solve_supernodal_sharded,
    make_mesh,
    pad_graph,
)
from gpslam_tpu.solve import lm_solve

N_DEV = 8


@pytest.fixture(scope="module")
def lc_problem():
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    return pose2_slam.build(data, dtype=jnp.float64)


def test_requires_mesh():
    assert len(jax.devices()) >= N_DEV


def test_sharded_lm_matches_single_device(lc_problem):
    graph, values = lc_problem
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=8)

    vals_sh, st_sh = lm_solve_supernodal_sharded(graph, values, mesh, cfg)

    sn = SupernodalSolver(pad_graph(graph, N_DEV), values)
    vals_1, st_1 = lm_solve(pad_graph(graph, N_DEV), values, cfg,
                            solver=sn.solver)

    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-9)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"]), np.asarray(vals_1["state"]), atol=1e-9
    )


def test_sharded_linear_step_matches(lc_problem):
    """One damped normal-equation solve: sharded == single-device."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from gpslam_tpu.parallel.supernodal_shard import ShardedSupernodalSolver

    graph, values = lc_problem
    gp = pad_graph(graph, N_DEV)
    mesh = make_mesh(N_DEV, axis_name="node")
    sn_sh = ShardedSupernodalSolver(gp, values, N_DEV)
    sn_1 = SupernodalSolver(gp, values)
    lam = jnp.asarray(0.05, jnp.float64)

    graph_specs = jax.tree_util.tree_map(lambda _: P("node"), gp)
    values_specs = jax.tree_util.tree_map(lambda _: P(), values)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_specs, values_specs),
        out_specs={g: P() for g in values},  # delta: one flat array per group
        check_vma=False,
    )
    def sharded_step(graph_local, vals):
        lins = graphlib.linearize(graph_local, vals)
        blocks, g = sn_sh.assemble_local(graph_local, lins, vals, "node")
        blocks, g = jax.lax.psum((blocks, g), "node")
        blocks = sn_sh.add_damping(blocks, lam)
        L = sn_sh.factorize_sharded(blocks, "node")
        return sn_sh.unpack(gp, sn_sh.solve_factored(L, -g))

    d_sh = jax.jit(sharded_step)(gp, values)

    lins = graphlib.linearize(gp, values)
    d_1 = sn_1.solver(gp, values, lins, lam)

    for grp in d_1:
        np.testing.assert_allclose(
            np.asarray(d_sh[grp]), np.asarray(d_1[grp]), atol=1e-10
        )


def test_sharded_unrolled_dense_tail(lc_problem):
    """Regression (round 5): the UNROLLED sharded factorization dropped the
    dense-tail factor entirely (solve_factored then crashed unpacking it) —
    it must return (blocks, L_tail) like the streamed variants and match the
    no-tail solve."""
    graph, values = lc_problem
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=6)
    v_t, st_t = lm_solve_supernodal_sharded(graph, values, mesh, cfg,
                                            mode="unrolled", dense_tail=2)
    v_u, st_u = lm_solve_supernodal_sharded(graph, values, mesh, cfg,
                                            mode="unrolled")
    assert float(st_t.error) == pytest.approx(float(st_u.error), rel=1e-8)
    np.testing.assert_allclose(
        np.asarray(v_t["state"]), np.asarray(v_u["state"]), atol=1e-7
    )


def test_sharded_stream_lm_matches_unrolled(lc_problem):
    """P2 factorization as a chunked opcode stream (UPD*/REDUCE/APPLY*/
    CHOL*/TRSM* per level, compile O(1) in levels) == the per-level
    unrolled sharded path, end-to-end through LM."""
    graph, values = lc_problem
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=6)
    v_u, st_u = lm_solve_supernodal_sharded(graph, values, mesh, cfg,
                                            mode="unrolled")
    v_s, st_s = lm_solve_supernodal_sharded(graph, values, mesh, cfg,
                                            mode="stream")
    assert float(st_s.error) == pytest.approx(float(st_u.error), rel=1e-10)
    np.testing.assert_allclose(
        np.asarray(v_s["state"]), np.asarray(v_u["state"]), atol=1e-9
    )


@pytest.mark.slow
def test_sharded_stream_lm_at_scale():
    """Supernode-sharded LM in STREAM mode on a 1000-state SE(2)
    loop-closure graph (real fill, 8-dev CPU mesh) vs single-device."""
    data = synthetic.make_se2_pose_graph(n_states=1000, seed=7)
    assert data["lc_i"].shape[0] > 30
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=6)
    v_s, st_s = lm_solve_supernodal_sharded(graph, values, mesh, cfg,
                                            mode="stream")
    sn = SupernodalSolver(pad_graph(graph, N_DEV), values)
    v_1, st_1 = lm_solve(pad_graph(graph, N_DEV), values, cfg,
                         solver=sn.solver)
    assert float(st_s.error) == pytest.approx(float(st_1.error), rel=1e-8)
    np.testing.assert_allclose(
        np.asarray(v_s["state"]), np.asarray(v_1["state"]), atol=1e-6
    )


def test_sharded_amalgamated_lm_matches_single_device(lc_problem):
    """P2 at amalgamated supernode-PANEL granularity (round 4): the sharded
    panel-level factorization + sliced variable-block assembly == the
    single-device amalgamated solver, end-to-end through LM."""
    from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver

    graph, values = lc_problem
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=6)
    v_sh, st_sh = lm_solve_supernodal_sharded(
        graph, values, mesh, cfg, w_max=4, ordering="nd", mode="unrolled",
        pallas_stream=False,
    )
    sn = AmalgamatedSupernodalSolver(pad_graph(graph, N_DEV), values,
                                     w_max=4, ordering="nd")
    v_1, st_1 = lm_solve(pad_graph(graph, N_DEV), values, cfg,
                         solver=sn.solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-9)
    np.testing.assert_allclose(
        np.asarray(v_sh["state"]), np.asarray(v_1["state"]), atol=1e-9
    )


def test_sharded_pallas_stream_lm_matches_xla_stream(lc_problem):
    """VERDICT r3 item 6: the gather-GEMM-fed sharded stream (UPD/TRSM as
    pallas kernels with device-indexed runtime schedules, interpret mode on
    the CPU mesh) == the XLA sharded stream, f32, end-to-end through LM."""
    graph, values64 = lc_problem
    values = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), values64
    )
    graph = jax.tree_util.tree_map(
        lambda a: (jnp.asarray(a, jnp.float32)
                   if jnp.asarray(a).dtype == jnp.float64 else a), graph
    )
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=5)
    v_p, st_p = lm_solve_supernodal_sharded(
        graph, values, mesh, cfg, w_max=4, ordering="nd", mode="stream",
        pallas_stream=True,
    )
    v_x, st_x = lm_solve_supernodal_sharded(
        graph, values, mesh, cfg, w_max=4, ordering="nd", mode="stream",
        pallas_stream=False,
    )
    assert float(st_p.error) == pytest.approx(float(st_x.error), rel=2e-4)
    np.testing.assert_allclose(
        np.asarray(v_p["state"]), np.asarray(v_x["state"]), atol=2e-4
    )
