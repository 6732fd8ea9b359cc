"""Subtree-pipelined Cholesky over the 8-device CPU mesh (SURVEY.md §2.4 P3):
independent etree subtrees per device, one delta-psum frontal reduction,
replicated dense-tail root — parity vs the single-device supernodal solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops.supernodal import SupernodalSolver
from gpslam_tpu.parallel import (
    lm_solve_subtree_sharded,
    make_mesh,
    pad_graph,
)
from gpslam_tpu.parallel.subtree_shard import SubtreeShardedSolver
from gpslam_tpu.solve import lm_solve

N_DEV = 8


@pytest.fixture(scope="module")
def lc_problem():
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    return pose2_slam.build(data, dtype=jnp.float64)


def test_partition_properties(lc_problem):
    """Every non-tail column is owned by exactly one device, parents of
    non-tail columns stay on the owner's device, and the partition spans
    multiple devices (genuine subtree distribution, not one big blob)."""
    graph, values = lc_problem
    gp = pad_graph(graph, N_DEV)
    sn = SubtreeShardedSolver(gp, values, N_DEV)
    owner = sn.subtree_owner
    assert owner.shape == (sn.ns,)
    assert owner.min() >= 0 and owner.max() < N_DEV
    # component closure: a column's etree parent (first struct entry) is
    # either in the dense tail or owned by the same device
    for j in range(sn.ns):
        if sn.struct[j]:
            p = sn.struct[j][0]
            if p < sn.ns:
                assert owner[p] == owner[j], (j, p)
    assert len(np.unique(owner)) >= 2
    # LPT balance: no device holds more than ~2/3 of the total local work
    load = sn.subtree_load
    assert load.max() <= 0.67 * load.sum() + 1e-9, load


def test_factorize_solve_matches_single_device(lc_problem):
    """One damped normal-equation solve through the subtree-sharded
    factorization == the single-device supernodal solve."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from gpslam_tpu.graph import graph as graphlib

    graph, values = lc_problem
    gp = pad_graph(graph, N_DEV)
    mesh = make_mesh(N_DEV, axis_name="node")
    sn_sh = SubtreeShardedSolver(gp, values, N_DEV)
    sn_1 = SupernodalSolver(gp, values, ordering="nd")  # same perm as sn_sh
    lam = jnp.asarray(0.05, jnp.float64)

    graph_specs = jax.tree_util.tree_map(lambda _: P("node"), gp)
    values_specs = jax.tree_util.tree_map(lambda _: P(), values)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_specs, values_specs),
        out_specs={g: P() for g in values},
        check_vma=False,
    )
    def sharded_step(graph_local, vals):
        lins = graphlib.linearize(graph_local, vals)
        blocks, g = sn_sh.assemble_local(graph_local, lins, vals, "node")
        blocks, g = jax.lax.psum((blocks, g), "node")
        blocks = sn_sh.add_damping(blocks, lam)
        L = sn_sh.factorize_subtree(blocks, "node")
        x = sn_sh.solve_subtree(L, -g, "node")
        return sn_sh.unpack(gp, x)

    delta_sh = jax.jit(sharded_step)(gp, values)

    lins = graphlib.linearize(gp, values)
    blocks, g = sn_1.assemble(gp, lins, values, lam)
    L = sn_1.factorize(blocks)
    x = sn_1.solve_factored(L, -g)
    delta_1 = sn_sh.unpack(gp, x)  # same elimination positions (nd perm)

    for grp in delta_1:
        np.testing.assert_allclose(
            np.asarray(delta_sh[grp]), np.asarray(delta_1[grp]),
            atol=1e-10, err_msg=grp,
        )


def test_subtree_lm_matches_single_device(lc_problem):
    graph, values = lc_problem
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=8)

    vals_sh, st_sh = lm_solve_subtree_sharded(graph, values, mesh, cfg)

    sn = SupernodalSolver(pad_graph(graph, N_DEV), values)
    vals_1, st_1 = lm_solve(pad_graph(graph, N_DEV), values, cfg,
                            solver=sn.solver)

    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-9)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"]), np.asarray(vals_1["state"]), atol=1e-8
    )


def test_stream_matches_unrolled(lc_problem):
    """Streamed subtree factorization/solves (device-side chunked
    instruction stream) == the unrolled per-level schedules, same mesh."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from gpslam_tpu.graph import graph as graphlib

    graph, values = lc_problem
    gp = pad_graph(graph, N_DEV)
    mesh = make_mesh(N_DEV, axis_name="node")
    lam = jnp.asarray(0.05, jnp.float64)
    sn_u = SubtreeShardedSolver(gp, values, N_DEV, mode="unrolled")
    sn_s = SubtreeShardedSolver(gp, values, N_DEV, mode="stream")

    graph_specs = jax.tree_util.tree_map(lambda _: P("node"), gp)
    values_specs = jax.tree_util.tree_map(lambda _: P(), values)

    def step(sn):
        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(graph_specs, values_specs),
            out_specs={g: P() for g in values}, check_vma=False,
        )
        def f(graph_local, vals):
            lins = graphlib.linearize(graph_local, vals)
            blocks, g = sn.assemble_local(graph_local, lins, vals, "node")
            blocks, g = jax.lax.psum((blocks, g), "node")
            blocks = sn.add_damping(blocks, lam)
            L = sn.factorize_subtree(blocks, "node")
            x = sn.solve_subtree(L, -g, "node")
            return sn.unpack(gp, x)
        return jax.jit(f)(gp, values)

    d_u = step(sn_u)
    d_s = step(sn_s)
    for grp in d_u:
        np.testing.assert_allclose(
            np.asarray(d_s[grp]), np.asarray(d_u[grp]), atol=1e-10,
            err_msg=grp,
        )


@pytest.mark.slow
def test_subtree_stream_lm_at_scale():
    """End-to-end subtree-sharded LM in STREAM mode on a 1000-state SE(2)
    loop-closure graph — real fill, multi-level subtree schedules, 8-dev
    CPU mesh (VERDICT r2 item 3's done-criterion shape)."""
    data = synthetic.make_se2_pose_graph(n_states=1000, seed=7)
    assert data["lc_i"].shape[0] > 30
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    mesh = make_mesh(N_DEV, axis_name="node")
    cfg = LMConfig(max_iterations=6)

    vals_sh, st_sh = lm_solve_subtree_sharded(graph, values, mesh, cfg,
                                              mode="stream")
    sn = SupernodalSolver(pad_graph(graph, N_DEV), values, ordering="nd")
    vals_1, st_1 = lm_solve(pad_graph(graph, N_DEV), values, cfg,
                            solver=sn.solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-8)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"]), np.asarray(vals_1["state"]), atol=1e-6
    )
