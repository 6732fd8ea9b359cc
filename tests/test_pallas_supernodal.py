"""Pallas gather-GEMM supernodal mode (ops/pallas_supernodal.py) parity vs
the unrolled level schedules — interpret mode on CPU (§5.2 sanitizer
discipline: the kernels' semantics are validated serially here; the same
code runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver


@pytest.fixture(scope="module")
def problem():
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    lins = graphlib.linearize(graph, values)
    return graph, values, lins


@pytest.mark.parametrize("dense_tail", [0, 2])
def test_pallas_solver_matches_unrolled(problem, dense_tail):
    graph, values, lins = problem
    lam = jnp.float32(0.01)
    sn_u = AmalgamatedSupernodalSolver(graph, values, ordering="nd",
                                       w_max=4, mode="unrolled",
                                       dense_tail=dense_tail)
    sn_p = AmalgamatedSupernodalSolver(graph, values, ordering="nd",
                                       w_max=4, mode="pallas",
                                       dense_tail=dense_tail)
    d_u = jax.jit(lambda g, v, l: sn_u.solver(g, v, l, lam))(
        graph, values, lins)
    d_p = jax.jit(lambda g, v, l: sn_p.solver(g, v, l, lam))(
        graph, values, lins)
    for grp in d_u:
        a, b = np.asarray(d_u[grp]), np.asarray(d_p[grp])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        # f32 + explicit panel inverses in the TRSM: small extra rounding
        assert rel < 2e-4, (grp, rel)


def test_pallas_mode_rejects_unpadded_blocks(problem):
    graph, values, _ = problem
    from gpslam_tpu.ops.supernodal import SupernodalSolver

    with pytest.raises(ValueError, match="divisible by 8"):
        SupernodalSolver(graph, values, mode="pallas")  # b = 6


@pytest.mark.parametrize("dense_tail", [0, 2])
def test_pallas_stream_solver_matches_unrolled(problem, dense_tail):
    """mode='pallas_stream' (chunked instruction stream with gather-GEMM
    step kernels, compile O(1) in levels — what auto_solver dispatches on
    TPU for large graphs) == unrolled level schedules, interpret mode."""
    graph, values, lins = problem
    lam = jnp.float32(0.01)
    sn_u = AmalgamatedSupernodalSolver(graph, values, ordering="nd",
                                       w_max=4, mode="unrolled",
                                       dense_tail=dense_tail)
    sn_p = AmalgamatedSupernodalSolver(graph, values, ordering="nd",
                                       w_max=4, mode="pallas_stream",
                                       dense_tail=dense_tail)
    d_u = jax.jit(lambda g, v, l: sn_u.solver(g, v, l, lam))(
        graph, values, lins)
    d_p = jax.jit(lambda g, v, l: sn_p.solver(g, v, l, lam))(
        graph, values, lins)
    for grp in d_u:
        a, b = np.asarray(d_u[grp]), np.asarray(d_p[grp])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        assert rel < 2e-4, (grp, rel)


@pytest.mark.parametrize("dense_tail", [0, 2])
def test_pallas_selected_inverse_matches_unrolled(problem, dense_tail):
    """The pallas-factor tuple branch of selected_inverse (VERDICT r3 weak
    1): a factor produced by mode='pallas' must yield the same selected
    inverse (hence marginals) as the unrolled factorization."""
    graph, values, lins = problem
    lam = jnp.float32(0.01)
    sn_u = AmalgamatedSupernodalSolver(graph, values, ordering="nd",
                                       w_max=4, mode="unrolled",
                                       dense_tail=dense_tail)
    sn_p = AmalgamatedSupernodalSolver(graph, values, ordering="nd",
                                       w_max=4, mode="pallas",
                                       dense_tail=dense_tail)

    def marg(sn):
        blocks, _ = sn.assemble(graph, lins, values, lam)
        L = sn.factorize(blocks)
        S = sn.selected_inverse(L)
        return sn.diag_marginals(S, graph)

    m_u = jax.jit(lambda: marg(sn_u))()
    m_p = jax.jit(lambda: marg(sn_p))()
    for grp in m_u:
        a, b = np.asarray(m_u[grp]), np.asarray(m_p[grp])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        assert rel < 5e-4, (grp, rel)
