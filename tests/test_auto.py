"""Pin auto_solver's dispatch decisions (VERDICT r2 item 7): a regression in
make_chain_solver's structure check or in the size heuristics must not
silently reroute Plaza-shaped problems onto the 10x-slower general path.

All checks are host-side (which backend was picked), plus one tiny solve per
route to prove the returned callable actually works.
"""

import io
from contextlib import redirect_stdout

import jax.numpy as jnp
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d, pose2_slam
from gpslam_tpu.solve import lm_solve
from gpslam_tpu.solve.auto import auto_solver


def _dispatch(graph, values, **kw):
    buf = io.StringIO()
    with redirect_stdout(buf):
        solver = auto_solver(graph, values, verbose=True, **kw)
    return solver, buf.getvalue()


def test_plaza_chain_routes_to_chain():
    """Plaza-shaped range-only SLAM (chain + arrowhead) -> BCR/Schur."""
    data = synthetic.make_linear2d_range_slam(n_states=300,
                                              ranges_per_interval=0.36,
                                              seed=0)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    solver, msg = _dispatch(graph, values)
    assert "chain (BCR + Schur)" in msg, msg
    vals, st = lm_solve(graph, values, LMConfig(max_iterations=10),
                        solver=solver)
    assert float(st.error) < float(st.error0)


def test_small_loop_graph_routes_to_supernodal_md():
    """600-state SE(2) loop-closure graph -> amalgamated supernodal with
    min-degree ordering (small-graph branch)."""
    data = synthetic.make_se2_pose_graph(n_states=600, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    solver, msg = _dispatch(graph, values)
    assert "supernodal" in msg, msg
    assert "ordering=md" in msg, msg
    vals, st = lm_solve(graph, values, LMConfig(max_iterations=6),
                        solver=solver)
    assert float(st.error) < float(st.error0)


def test_large_loop_graph_routes_to_supernodal_nd_stream():
    """Beyond _ND_MIN_VARS -> nested dissection + instruction stream +
    dense top-of-tree (the large-graph exact path; dispatch only, no
    solve — covered by the slow supernodal suites)."""
    data = synthetic.make_se2_pose_graph(n_states=2000, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    solver, msg = _dispatch(graph, values)
    assert "supernodal" in msg, msg
    assert "ordering=nd" in msg, msg
    assert "mode=stream" in msg, msg
    # the dense top-of-tree must be a REAL ~_TAIL_DIM-wide MXU tail, not a
    # token panel (VERDICT r3 weak 3: a 1-panel tail passed the old check)
    import re

    m = re.search(r"dense_tail=(\d+) panels", msg)
    assert m, msg
    assert int(m.group(1)) >= 16, msg


def test_tiny_nonchain_routes_to_dense():
    """A tiny loop-closure graph (total tangent <= 300) -> dense."""
    data = synthetic.make_se2_pose_graph(n_states=60, seed=4)
    assert data["lc_i"].shape[0] > 0
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    solver, msg = _dispatch(graph, values)
    assert "dense" in msg, msg
    vals, st = lm_solve(graph, values, LMConfig(max_iterations=8),
                        solver=solver)
    assert float(st.error) < float(st.error0)


def test_extreme_fill_routes_to_pcg(monkeypatch):
    """When the factor storage estimate exceeds the limit -> block-Jacobi
    PCG fallback (exercised by shrinking the limit, not by building a 4 GB
    factor)."""
    from gpslam_tpu.solve import auto as auto_mod

    data = synthetic.make_se2_pose_graph(n_states=600, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    monkeypatch.setattr(auto_mod, "_FACTOR_BYTES_MAX", 1024)
    solver, msg = _dispatch(graph, values)
    assert "PCG" in msg, msg
    vals, st = lm_solve(graph, values, LMConfig(max_iterations=4),
                        solver=solver)
    assert float(st.error) < float(st.error0)


def test_large_loop_graph_on_tpu_routes_to_mega(monkeypatch):
    """On the TPU backend the large-graph exact path picks mode=mega — the
    single-launch manual-DMA factorization + solve kernels (VERDICT r4
    item 1) — instead of the XLA stream. Dispatch decision only;
    compiled-kernel parity is covered by the opt-in device test / bench."""
    from gpslam_tpu.solve import auto as auto_mod

    data = synthetic.make_se2_pose_graph(n_states=1600, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    monkeypatch.setattr(auto_mod.jax, "default_backend", lambda: "tpu")
    solver, msg = _dispatch(graph, values)
    assert "mode=mega" in msg, msg
    assert "ordering=nd" in msg, msg
    # the bench times the object auto_supernodal returns — it must agree
    # with the dispatched configuration (VERDICT r4 item 5)
    sn = auto_mod.auto_supernodal(graph, values)
    assert sn._mode == "mega" and sn.w_max == 8
    assert f"dense_tail={sn.n_tail} panels" in msg, msg


def test_large_loop_graph_f64_stays_on_stream(monkeypatch):
    """pallas mode is f32-only; f64 graphs must keep the stream even on
    TPU-reporting backends."""
    from gpslam_tpu.solve import auto as auto_mod

    data = synthetic.make_se2_pose_graph(n_states=1600, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    monkeypatch.setattr(auto_mod.jax, "default_backend", lambda: "tpu")
    solver, msg = _dispatch(graph, values)
    assert "mode=stream" in msg, msg


def test_landmark_rich_graph_skips_dense_arrowhead(monkeypatch):
    """When the chain solver's dense H_sl arrowhead storage would exceed the
    budget, auto must route to the supernodal path even though the graph
    satisfies the chain contract (VERDICT r3 weak 6 follow-on: the scale
    guard for landmark-rich config-3-style graphs)."""
    from gpslam_tpu.solve import auto as auto_mod

    data = synthetic.make_se2_landmark_slam(n_states=150, seed=1)
    graph, values = pose2_slam.build_landmark_slam(data, dtype=jnp.float64)
    monkeypatch.setattr(auto_mod, "_ARROWHEAD_BYTES_MAX", 1024)
    solver, msg = _dispatch(graph, values)
    assert "chain skipped (dense arrowhead" in msg, msg
    assert "supernodal" in msg, msg
    vals, st = lm_solve(graph, values, LMConfig(max_iterations=6),
                        solver=solver)
    assert float(st.error) < float(st.error0)


def test_landmark_slam_routes_to_chain():
    """Config-3-shaped SE(2) landmark SLAM (bearing-range touches one state
    + one landmark: chain + arrowhead) must stay on the chain solver — a
    structure-check regression demoting it to the general path would cost
    ~10x."""
    data = synthetic.make_se2_landmark_slam(n_states=150, seed=1)
    graph, values = pose2_slam.build_landmark_slam(data, dtype=jnp.float64)
    solver, msg = _dispatch(graph, values)
    assert "chain (BCR + Schur)" in msg, msg
    vals, st = lm_solve(graph, values, LMConfig(max_iterations=8),
                        solver=solver)
    assert float(st.error) < float(st.error0)
