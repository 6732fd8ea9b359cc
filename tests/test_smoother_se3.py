"""SE(3) fixed-lag smoother: full Lie-state windows (poses as (R, t)
pytrees) track a range-beacon trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from gpslam_tpu.io import synthetic
from gpslam_tpu.smoother import FixedLagSmoother, SmootherConfig


def test_se3_smoother_runs_and_improves():
    n, W, L = 60, 25, 4
    dt = 0.5
    rng = np.random.default_rng(44)
    base = synthetic.make_se3_pose_graph(n_states=n, dt=dt, seed=44)
    R, t, vel = base["gt_R"], base["gt_t"], base["gt_vel"]
    lms = rng.uniform(t.min(0) - 3, t.max(0) + 3, (L, 3))
    # range measurements at interval midpoints
    ranges = []
    for k in range(n - 1):
        for _ in range(2):
            j = int(rng.integers(0, L))
            p = 0.5 * (t[k] + t[k + 1])
            ranges.append((k, 0.5 * dt, j,
                           np.linalg.norm(p - lms[j]) + rng.normal(scale=0.1)))

    cfg = SmootherConfig(window=W, ranges_per_step=2, dt=dt, qc=0.05,
                         odom_sigma=float(base["odom_sigma_trans"]),
                         odom_sigma_th=float(base["odom_sigma_rot"]),
                         range_sigma=0.1, iters_per_step=3)
    sm = FixedLagSmoother(cfg, n_landmarks=L, model="se3")

    by_iv = {}
    for i, (k, tau, j, z) in enumerate(ranges):
        by_iv.setdefault(k, []).append((tau, z, j))
    init_rs = {"interval": [], "tau": [], "z": [], "lm": []}
    for k in range(W - 1):
        for tau, z, j in by_iv.get(k, []):
            init_rs["interval"].append(k)
            init_rs["tau"].append(tau)
            init_rs["z"].append(z)
            init_rs["lm"].append(j)

    s = sm.init(
        (base["init_R"][:W], base["init_t"][:W]), base["init_vel"][:W],
        lms + rng.normal(scale=0.3, size=lms.shape),
        odom_z=(base["odom_R"][: W - 1], base["odom_t"][: W - 1]),
        ranges={k: np.asarray(v) for k, v in init_rs.items()},
    )
    s = sm.settle(s, iters=10)

    tails = []
    Rr = cfg.ranges_per_step
    for k in range(W - 1, n - 1):
        obs = by_iv.get(k, [])[:Rr]
        tau = np.full((Rr,), 0.5 * dt)
        z = np.zeros((Rr,))
        lm = np.zeros((Rr,), np.int32)
        valid = np.zeros((Rr,))
        for j, (tt, zz, jj) in enumerate(obs):
            tau[j], z[j], lm[j], valid[j] = tt, zz, jj, 1.0
        s, out = sm.step(
            s, (base["odom_R"][k], base["odom_t"][k]), tau, z, lm, valid
        )
        tails.append(np.asarray(out["x"][1][0]))  # oldest translation
    tails = np.asarray(tails)
    assert np.all(np.isfinite(tails))
    tail_idx = np.arange(W - 1, n - 1) - W + 2
    err = np.linalg.norm(tails - t[tail_idx], axis=-1)
    init_err = np.linalg.norm(base["init_t"][tail_idx] - t[tail_idx], axis=-1)
    # smoothed Lie-state estimates track truth at least as well as odometry
    # dead reckoning
    assert err.mean() <= init_err.mean() * 1.1, (err.mean(), init_err.mean())
    # rotation stays orthonormal through many retract cycles
    Rw = np.asarray(out["x"][0])
    I = np.eye(3)
    assert np.abs(Rw @ Rw.transpose(0, 2, 1) - I).max() < 1e-4
