"""Fixed-lag smoother tests: tracks the full-batch MAP solution (the
incremental-capability criterion of SURVEY.md §2.2 S11)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.smoother import FixedLagSmoother, SmootherConfig
from gpslam_tpu.solve import lm_solve


@pytest.fixture(scope="module")
def scenario():
    n = 120
    data = synthetic.make_linear2d_range_slam(
        n_states=n, ranges_per_interval=0.5, seed=21, init_noise=0.3
    )
    graph, values = linear2d.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    batch_vals, _ = lm_solve(graph, values, LMConfig(), solver=solver)
    return data, batch_vals


def run_smoother(data, W=40, iters=2):
    n = data["gt_pos"].shape[0]
    cfg = SmootherConfig(
        window=W,
        ranges_per_step=4,
        dt=float(data["dt"]),
        qc=float(data["qc"]),
        odom_sigma=float(data["odom_sigma"]),
        range_sigma=float(data["range_sigma"]),
        iters_per_step=iters,
    )
    L = data["landmarks_gt"].shape[0]
    sm = FixedLagSmoother(cfg, n_landmarks=L, dtype=jnp.float32)

    # group range measurements by interval
    by_iv = {}
    for k in range(data["range_i"].shape[0]):
        by_iv.setdefault(int(data["range_i"][k]), []).append(k)

    # cold start: first W states from the (noisy) init, WITH the window's
    # odometry and range measurements, then settle
    init_ks = [k for iv in range(W - 1) for k in by_iv.get(iv, [])]
    s = sm.init(
        data["init_pos"][:W], data["init_vel"][:W], data["init_landmarks"],
        odom_z=data["odom_z"][: W - 1],
        ranges={
            "interval": data["range_i"][init_ks],
            "tau": data["range_tau"][init_ks],
            "z": data["range_z"][init_ks],
            "lm": data["range_lm"][init_ks],
        },
    )
    s = sm.settle(s, iters=15)

    R = cfg.ranges_per_step
    head, tail = [], []
    for t in range(W - 1, n - 1):
        # new interval is (t, t+1)
        ks = by_iv.get(t, [])[:R]
        tau = np.full((R,), 0.5 * cfg.dt)
        z = np.zeros((R,))
        lm = np.zeros((R,), np.int32)
        valid = np.zeros((R,))
        for j, k in enumerate(ks):
            tau[j] = data["range_tau"][k]
            z[j] = data["range_z"][k]
            lm[j] = data["range_lm"][k]
            valid[j] = 1.0
        s, out = sm.step(s, data["odom_z"][t], tau, z, lm, valid)
        head.append(np.asarray(out["head_x"]))  # filtered (state t+1)
        tail.append(np.asarray(out["x"][0]))  # smoothed (state t-W+2)
    return np.asarray(head), np.asarray(tail)


def test_smoother_tracks_batch_solution(scenario):
    data, batch_vals = scenario
    W = 40
    head, tail = run_smoother(data, W=W, iters=3)
    n = data["gt_pos"].shape[0]
    batch_pos = np.asarray(batch_vals["state"][0])

    # the SMOOTHED estimate (oldest-in-window, full lag of measurements)
    # must track the batch MAP closely
    tail_idx = np.arange(W - 1, n - 1) - W + 2
    tail_err = np.sqrt(((tail - batch_pos[tail_idx]) ** 2).sum(-1))
    assert np.median(tail_err) < 0.4, np.median(tail_err)
    assert tail_err.max() < 1.0, tail_err.max()

    # the filtered head estimate is allowed a larger (causal) gap
    head_err = np.sqrt(((head - batch_pos[W:n]) ** 2).sum(-1))
    assert np.median(head_err) < 0.8, np.median(head_err)

    # accuracy vs ground truth within 1.5x of the full-batch smoother
    gt = data["gt_pos"]
    tail_gt = np.sqrt(((tail - gt[tail_idx]) ** 2).sum(-1).mean())
    batch_gt = np.sqrt(((batch_pos - gt) ** 2).sum(-1).mean())
    assert tail_gt < 1.5 * batch_gt


def test_smoother_step_is_constant_shape(scenario):
    data, _ = scenario
    cfg = SmootherConfig(window=20, dt=float(data["dt"]),
                         qc=float(data["qc"]),
                         odom_sigma=float(data["odom_sigma"]),
                         range_sigma=float(data["range_sigma"]))
    L = data["landmarks_gt"].shape[0]
    sm = FixedLagSmoother(cfg, n_landmarks=L)
    s = sm.init(data["init_pos"][:20], data["init_vel"][:20],
                data["init_landmarks"])
    R = cfg.ranges_per_step
    none = (np.full((R,), 0.5), np.zeros((R,)), np.zeros((R,), np.int32),
            np.zeros((R,)))
    s1, _ = sm.step(s, data["odom_z"][19], *none)
    s2, _ = sm.step(s1, data["odom_z"][20], *none)
    # state pytree shapes are static
    import jax

    sh1 = jax.tree_util.tree_map(lambda a: a.shape, s1)
    sh2 = jax.tree_util.tree_map(lambda a: a.shape, s2)
    assert sh1 == sh2


def test_smoother_marginals(scenario):
    data, _ = scenario
    cfg = SmootherConfig(window=20, dt=float(data["dt"]), qc=float(data["qc"]),
                         odom_sigma=float(data["odom_sigma"]),
                         range_sigma=float(data["range_sigma"]))
    L = data["landmarks_gt"].shape[0]
    sm = FixedLagSmoother(cfg, n_landmarks=L)
    s = sm.init(data["init_pos"][:20], data["init_vel"][:20],
                data["init_landmarks"], odom_z=data["odom_z"][:19])
    s = sm.settle(s, iters=10)
    cov = sm.marginals(s)
    S = np.asarray(cov["state"])
    assert S.shape == (20, 4, 4)
    eig = np.linalg.eigvalsh(S)
    assert np.all(eig > 0)
    # the anchored (oldest) state is most certain
    tr = np.trace(S, axis1=-2, axis2=-1)
    assert np.argmin(tr) == 0
