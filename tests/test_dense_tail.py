"""Dense top-of-tree (switch-to-dense) supernodal path: the trailing
elimination positions are factored as ONE dense Cholesky (the CHOLMOD
dense-root trick; reference framing: gtsam multifrontal root cliques,
SURVEY.md §2.2 S9). Exact-parity vs the pure block-sparse schedules in f64;
f32 sanity at looser tolerance (the dense path is in fact closer to the f64
truth than the block path on ill-conditioned graphs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver
from gpslam_tpu.ops.supernodal import SupernodalSolver
from gpslam_tpu.solve import lm_solve


def _setup(dtype=jnp.float64, n_states=90):
    data = synthetic.make_se2_pose_graph(n_states=n_states, seed=0)
    graph, values = pose2_slam.build(data, dtype=dtype)
    lins = graphlib.linearize(graph, values)
    return graph, values, lins


@pytest.mark.parametrize("ordering", ["md", "nd"])
@pytest.mark.parametrize("mode", ["unrolled", "stream"])
def test_dense_tail_factor_solve_parity_f64(ordering, mode):
    with jax.enable_x64(True):
        graph, values, lins = _setup()
        s0 = SupernodalSolver(graph, values, ordering=ordering, mode=mode)
        blocks0, g = s0.assemble(graph, lins, values, 1e-3)
        x0 = s0.solve_factored(s0.factorize(blocks0), -g)
        for nt in (1, 17, 90):  # partial tails + fully dense
            st = SupernodalSolver(graph, values, ordering=ordering,
                                  mode=mode, dense_tail=nt)
            bt, gt = st.assemble(graph, lins, values, 1e-3)
            xt = st.solve_factored(st.factorize(bt), -gt)
            np.testing.assert_allclose(np.asarray(xt), np.asarray(x0),
                                       atol=1e-9)


@pytest.mark.parametrize("ordering", ["md", "nd"])
def test_dense_tail_selected_inverse_parity_f64(ordering):
    with jax.enable_x64(True):
        graph, values, lins = _setup()
        s0 = SupernodalSolver(graph, values, ordering=ordering)
        blocks0, g = s0.assemble(graph, lins, values, 1e-3)
        S0 = s0.selected_inverse(s0.factorize(blocks0))
        d0 = s0.diag_marginals(S0, graph)
        for nt in (11, 90):
            st = SupernodalSolver(graph, values, ordering=ordering,
                                  dense_tail=nt)
            bt, _ = st.assemble(graph, lins, values, 1e-3)
            St = st.selected_inverse(st.factorize(bt))
            dt = st.diag_marginals(St, graph)
            for grp in d0:
                np.testing.assert_allclose(np.asarray(dt[grp]),
                                           np.asarray(d0[grp]), atol=1e-9)


def test_dense_tail_f32_close_to_f64_truth():
    graph, values, lins = _setup(dtype=jnp.float32)
    with jax.enable_x64(True):
        graph64, values64, lins64 = _setup(dtype=jnp.float64)
        s64 = SupernodalSolver(graph64, values64)
        b64, g64 = s64.assemble(graph64, lins64, values64, 1e-3)
        x64 = np.asarray(s64.solve_factored(s64.factorize(b64), -g64))
    st = SupernodalSolver(graph, values, dense_tail=30)
    bt, gt = st.assemble(graph, lins, values, 1e-3)
    xt = np.asarray(st.solve_factored(st.factorize(bt), -gt))
    assert np.abs(xt - x64).max() < 5e-3 * max(1.0, np.abs(x64).max())


def test_dense_tail_lm_end_to_end_mixed_dims():
    """Landmark SLAM graph (mixed 3/2-dim blocks, padding) through full LM
    with a dense tail — matches the default supernodal LM chi^2."""
    data = synthetic.make_se2_landmark_slam(n_states=60, seed=1)
    graph, values = pose2_slam.build_landmark_slam(data, dtype=jnp.float32)
    cfg = LMConfig(max_iterations=25)
    s0 = SupernodalSolver(graph, values)
    _, st0 = lm_solve(graph, values, cfg, solver=s0.solver)
    st = SupernodalSolver(graph, values, dense_tail=25)
    _, stt = lm_solve(graph, values, cfg, solver=st.solver)
    assert float(stt.error) == pytest.approx(float(st0.error), rel=1e-3)


def test_dense_tail_amalgamated_panels():
    """Dense tail over trailing supernode PANELS of the amalgamated solver."""
    with jax.enable_x64(True):
        graph, values, lins = _setup()
        a0 = AmalgamatedSupernodalSolver(graph, values, w_max=4)
        b0, g0 = a0.assemble(graph, lins, values, 1e-3)
        x0 = a0.solve_factored(a0.factorize(b0), -g0)
        at = AmalgamatedSupernodalSolver(graph, values, w_max=4,
                                         dense_tail=7)
        bt, gt = at.assemble(graph, lins, values, 1e-3)
        xt = at.solve_factored(at.factorize(bt), -gt)
        np.testing.assert_allclose(np.asarray(xt), np.asarray(x0),
                                   atol=1e-9)
