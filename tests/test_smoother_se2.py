"""SE(2) Lie-state fixed-lag smoother: tracks the batch MAP on a range-only
SE(2) problem (the Lie variant of S11)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.factors import gp_priors, measurements
from gpslam_tpu.graph import GraphBuilder, manifolds
from gpslam_tpu.io import synthetic
from gpslam_tpu.ops import chain
from gpslam_tpu.smoother import FixedLagSmoother, SmootherConfig
from gpslam_tpu.solve import lm_solve


def make_se2_range_data(n=90, n_lm=4, dt=0.5, qc=0.05, seed=33,
                        range_sigma=0.2):
    """SE(2) trajectory + interpolated range measurements to beacons."""
    rng = np.random.default_rng(seed)
    base = synthetic.make_se2_pose_graph(n_states=n, dt=dt, qc=qc, seed=seed,
                                         loop_closure_prob=0.0)
    poses = base["gt_pose"]
    lo = poses[:, :2].min(0) - 3
    hi = poses[:, :2].max(0) + 3
    lms = rng.uniform(lo, hi, (n_lm, 2))
    iv, tau, lm, z = [], [], [], []
    for k in range(n - 1):
        if rng.random() < 0.8:
            t = rng.uniform(0.2, 0.8) * dt
            j = int(rng.integers(0, n_lm))
            # approximate ground-truth position at the interior time by
            # pose interpolation on the chord
            frac = t / dt
            p = (1 - frac) * poses[k, :2] + frac * poses[k + 1, :2]
            iv.append(k)
            tau.append(t)
            lm.append(j)
            z.append(np.linalg.norm(p - lms[j]) + rng.normal(scale=range_sigma))
    base.update(
        landmarks_gt=lms,
        init_landmarks=lms + rng.normal(scale=0.5, size=lms.shape),
        range_i=np.asarray(iv, np.int64),
        range_tau=np.asarray(tau),
        range_lm=np.asarray(lm, np.int64),
        range_z=np.asarray(z),
        range_sigma=range_sigma,
    )
    return base


def build_batch_graph(data, dtype=jnp.float64):
    n = data["init_pose"].shape[0]
    n_lm = data["init_landmarks"].shape[0]
    dt, qc = float(data["dt"]), float(data["qc"])
    b = GraphBuilder()
    b.add_group("state", manifolds.se2_state())
    b.add_group("landmark", manifolds.Vector(2))
    b.add_factors(
        "prior", measurements.prior_se2_state, ("state",),
        (np.zeros(1, np.int32),),
        {"mu_pose": jnp.asarray(data["gt_pose"][None, 0], dtype),
         "mu_vel": jnp.asarray(data["gt_vel"][None, 0], dtype),
         "sqrt_info": jnp.asarray((np.eye(6) / 0.01)[None], dtype)},
        rdim=6)
    qs = np.eye(3) / np.sqrt(qc)
    b.add_factors(
        "gp_prior", gp_priors.gp_prior_se2, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"dt": jnp.full((n - 1,), dt, dtype),
         "qc_sqrt_info": jnp.asarray(np.broadcast_to(qs, (n - 1, 3, 3)), dtype)},
        rdim=6)
    osq = np.diag([1 / data["odom_sigma_xy"]] * 2 + [1 / data["odom_sigma_th"]])
    b.add_factors(
        "odometry", measurements.between_se2, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"z": jnp.asarray(data["odom_z"], dtype),
         "sqrt_info": jnp.asarray(np.broadcast_to(osq, (n - 1, 3, 3)), dtype)},
        rdim=3)
    m = data["range_i"].shape[0]
    b.add_factors(
        "interp_range", measurements.interp_range_se2,
        ("state", "state", "landmark"),
        (data["range_i"], data["range_i"] + 1, data["range_lm"]),
        {"dt": jnp.full((m,), dt, dtype),
         "tau": jnp.asarray(data["range_tau"], dtype),
         "z": jnp.asarray(data["range_z"], dtype),
         "inv_sigma": jnp.full((m,), 1 / data["range_sigma"], dtype)},
        rdim=1)
    b.add_factors(
        "lm_prior", measurements.prior_vector, ("landmark",),
        (np.arange(n_lm),),
        {"mu": jnp.asarray(data["init_landmarks"], dtype),
         "sqrt_info": jnp.asarray(
             np.broadcast_to(np.eye(2) / 100.0, (n_lm, 2, 2)), dtype)},
        rdim=2)
    values = {"state": (jnp.asarray(data["init_pose"], dtype),
                        jnp.asarray(data["init_vel"], dtype)),
              "landmark": jnp.asarray(data["init_landmarks"], dtype)}
    return b.build(), values


def test_se2_smoother_tracks_batch():
    data = make_se2_range_data()
    graph, values = build_batch_graph(data)
    solver = chain.make_chain_solver(graph)
    batch_vals, bstats = lm_solve(graph, values, LMConfig(), solver=solver)
    assert bool(bstats.converged)
    batch_pose = np.asarray(batch_vals["state"][0])

    n = data["gt_pose"].shape[0]
    W = 30
    cfg = SmootherConfig(window=W, ranges_per_step=2, dt=float(data["dt"]),
                         qc=float(data["qc"]),
                         odom_sigma=float(data["odom_sigma_xy"]),
                         odom_sigma_th=float(data["odom_sigma_th"]),
                         range_sigma=float(data["range_sigma"]),
                         iters_per_step=3)
    sm = FixedLagSmoother(cfg, n_landmarks=data["landmarks_gt"].shape[0],
                          model="se2")
    by_iv = {}
    for k in range(data["range_i"].shape[0]):
        by_iv.setdefault(int(data["range_i"][k]), []).append(k)
    init_ks = [k for iv in range(W - 1) for k in by_iv.get(iv, [])]
    s = sm.init(
        data["init_pose"][:W], data["init_vel"][:W], data["init_landmarks"],
        odom_z=data["odom_z"][: W - 1],
        ranges={"interval": data["range_i"][init_ks],
                "tau": data["range_tau"][init_ks],
                "z": data["range_z"][init_ks],
                "lm": data["range_lm"][init_ks]},
    )
    s = sm.settle(s, iters=15)
    R = cfg.ranges_per_step
    tails = []
    for t in range(W - 1, n - 1):
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
        tails.append(np.asarray(out["x"][0]))
    tails = np.asarray(tails)
    tail_idx = np.arange(W - 1, n - 1) - W + 2
    err = np.sqrt(((tails[:, :2] - batch_pose[tail_idx, :2]) ** 2).sum(-1))
    assert np.median(err) < 0.3, np.median(err)
    assert np.all(np.isfinite(tails))
