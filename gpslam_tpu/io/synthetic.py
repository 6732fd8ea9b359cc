"""Synthetic problem generators for the BASELINE.json configs.

The reference validates on real datasets (Plaza1/Plaza2 "Autonomous
Lawnmower", SURVEY.md §2.1 G12); this environment has no network egress, so
benchmarks and tests use synthetic problems generated at matching scale and
structure: a lawnmower sweep trajectory, a few range beacons, GP-interpolated
range measurements at off-state times, and odometry — the same factor mix the
Plaza scripts build. Loaders for the real file formats live in io/formats.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def lawnmower_trajectory(n_states: int, dt: float, row_length: float = 60.0,
                         row_spacing: float = 3.0, speed: float = 1.0,
                         seed: int = 0) -> Dict[str, np.ndarray]:
    """Ground-truth 2D lawnmower sweep sampled at the state times.

    Returns {t, pos (N,2), vel (N,2)} in f64. The path mimics the Plaza
    "Autonomous Lawnmower" coverage pattern: straight rows joined by turns,
    with smooth velocity (finite-difference of the path).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_states) * dt
    s = speed * t  # arc length along the sweep
    period = 2.0 * row_length
    row = np.floor(s / row_length).astype(int)
    along = s - row * row_length
    # serpentine: even rows left->right, odd right->left
    x = np.where(row % 2 == 0, along, row_length - along)
    y = row * row_spacing
    pos = np.stack([x, y], -1)
    # smooth the corners a bit and add small wander so velocity varies
    wander = rng.normal(size=(n_states, 2)).cumsum(0) * 0.01
    pos = pos + wander
    vel = np.gradient(pos, dt, axis=0)
    return {"t": t, "pos": pos, "vel": vel}


def make_linear2d_range_slam(
    n_states: int = 200,
    dt: float = 1.0,
    n_landmarks: int = 4,
    ranges_per_interval: float = 0.4,
    range_sigma: float = 0.3,
    odom_sigma: float = 0.05,
    qc: float = 0.1,
    init_noise: float = 1.0,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Plaza-style range-only SLAM problem on the linear WNOA model
    (BASELINE.json config 2 structure; scale set by n_states).

    Returns a dict of f64 numpy arrays:
      gt_pos/gt_vel (N,2): ground truth
      landmarks_gt (L,2)
      odom_z (N-1,2): noisy relative positions, odom_sigma
      range_i (M,), range_tau (M,), range_lm (M,), range_z (M,): interpolated
        range measurements at time t_i + tau, to landmark range_lm
      init_pos/init_vel, init_landmarks: perturbed initializations
    """
    rng = np.random.default_rng(seed)
    traj = lawnmower_trajectory(n_states, dt, seed=seed)
    pos, vel = traj["pos"], traj["vel"]

    # beacons spread around the field (Plaza has 4)
    lo, hi = pos.min(0) - 5.0, pos.max(0) + 5.0
    landmarks = rng.uniform(lo, hi, size=(n_landmarks, 2))

    odom_z = (pos[1:] - pos[:-1]) + rng.normal(scale=odom_sigma, size=(n_states - 1, 2))

    m = rng.random(n_states - 1) < ranges_per_interval
    # allow multiple readings per interval by sampling count ~ Poisson-ish
    idx_i = np.nonzero(m)[0]
    tau = rng.uniform(0.15, 0.85, size=idx_i.shape[0]) * dt
    lm = rng.integers(0, n_landmarks, size=idx_i.shape[0])
    # true position at interpolation time (linear WNOA mean interpolation on
    # the ground truth is well approximated by cubic-hermite; use exact
    # hermite using gt pos/vel)
    p_tau = _hermite(pos[idx_i], vel[idx_i], pos[idx_i + 1], vel[idx_i + 1], dt, tau)
    d = np.linalg.norm(p_tau - landmarks[lm], axis=-1)
    range_z = d + rng.normal(scale=range_sigma, size=d.shape)

    init_pos = pos + rng.normal(scale=init_noise, size=pos.shape)
    init_vel = vel + rng.normal(scale=0.3 * init_noise, size=vel.shape)
    init_landmarks = landmarks + rng.normal(scale=2.0 * init_noise, size=landmarks.shape)

    # the first state is anchored at truth (datasets start at a surveyed
    # point); keeps the gauge fixed without biasing the estimate
    init_pos[0] = pos[0]
    init_vel[0] = vel[0]

    return {
        "dt": dt,
        "qc": qc,
        "range_sigma": range_sigma,
        "odom_sigma": odom_sigma,
        "anchor_pos": pos[0],
        "anchor_vel": vel[0],
        "gt_pos": pos,
        "gt_vel": vel,
        "landmarks_gt": landmarks,
        "odom_z": odom_z,
        "range_i": idx_i,
        "range_tau": tau,
        "range_lm": lm,
        "range_z": range_z,
        "init_pos": init_pos,
        "init_vel": init_vel,
        "init_landmarks": init_landmarks,
    }


def _hermite(p0, v0, p1, v1, dt, tau):
    """Cubic Hermite interpolation of position (matches the WNOA posterior
    mean for interior queries, used only to synthesize measurements)."""
    s = (tau / dt)[:, None]
    h00 = 2 * s**3 - 3 * s**2 + 1
    h10 = s**3 - 2 * s**2 + s
    h01 = -2 * s**3 + 3 * s**2
    h11 = s**3 - s**2
    return h00 * p0 + h10 * dt * v0 + h01 * p1 + h11 * dt * v1


def make_se2_pose_graph(
    n_states: int = 100,
    dt: float = 0.5,
    qc: float = 0.05,
    odom_sigma_xy: float = 0.05,
    odom_sigma_th: float = 0.01,
    loop_closure_prob: float = 0.05,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """2D pose-graph with GP-WNOA prior + odometry + loop closures
    (BASELINE.json config 1/3 structure). Trajectory: noisy circular sweep.

    Returns gt poses (N,3), gt body velocities (N,3), odometry measurements
    (N-1,3) in the between convention Log(Z^{-1} T_i^{-1} T_j), loop-closure
    pairs/measurements, and perturbed initial values.
    """
    rng = np.random.default_rng(seed)
    # ground truth: constant forward speed + slowly varying turn rate
    w = 0.25 + 0.15 * np.sin(np.linspace(0, 4 * np.pi, n_states))
    v = 1.0 + 0.2 * np.cos(np.linspace(0, 2 * np.pi, n_states))
    poses = np.zeros((n_states, 3))
    vels = np.zeros((n_states, 3))
    for k in range(n_states):
        vels[k] = [v[k], 0.0, w[k]]
        if k + 1 < n_states:
            # integrate T_{k+1} = T_k * Exp(dt * twist)
            poses[k + 1] = _se2_compose(poses[k], _se2_exp(dt * vels[k]))
    odom = np.zeros((n_states - 1, 3))
    for k in range(n_states - 1):
        rel = _se2_between(poses[k], poses[k + 1])
        noise = rng.normal(scale=[odom_sigma_xy, odom_sigma_xy, odom_sigma_th])
        odom[k] = _se2_compose(rel, _se2_exp(noise))

    # loop closures between revisited poses (same spatial cell)
    lc_i, lc_j, lc_z = [], [], []
    cell = {}
    for k in range(n_states):
        key = (int(poses[k, 0] / 2.0), int(poses[k, 1] / 2.0))
        if key in cell and k - cell[key] > 20 and rng.random() < loop_closure_prob * 10:
            i = cell[key]
            rel = _se2_between(poses[i], poses[k])
            noise = rng.normal(scale=[odom_sigma_xy, odom_sigma_xy, odom_sigma_th])
            lc_i.append(i)
            lc_j.append(k)
            lc_z.append(_se2_compose(rel, _se2_exp(noise)))
        cell[key] = k
    lc_i = np.asarray(lc_i, np.int64)
    lc_j = np.asarray(lc_j, np.int64)
    lc_z = np.asarray(lc_z).reshape(-1, 3)

    # initialization: integrate noisy odometry (standard SLAM init)
    init = np.zeros_like(poses)
    for k in range(n_states - 1):
        init[k + 1] = _se2_compose(init[k], odom[k])
    init_vel = vels + rng.normal(scale=0.1, size=vels.shape)

    return {
        "dt": dt,
        "qc": qc,
        "odom_sigma_xy": odom_sigma_xy,
        "odom_sigma_th": odom_sigma_th,
        "gt_pose": poses,
        "gt_vel": vels,
        "odom_z": odom,
        "lc_i": lc_i,
        "lc_j": lc_j,
        "lc_z": lc_z,
        "init_pose": init,
        "init_vel": init_vel,
    }


def make_se2_landmark_slam(
    n_states: int = 100,
    n_landmarks: int = 12,
    dt: float = 0.5,
    qc: float = 0.05,
    odom_sigma_xy: float = 0.05,
    odom_sigma_th: float = 0.01,
    bearing_sigma: float = 0.02,
    range_sigma: float = 0.15,
    max_obs_range: float = 12.0,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """2D landmark SLAM (BASELINE.json config 3): SE(2) trajectory with
    GP-WNOA prior, odometry, and bearing-range observations of landmarks
    within sensor range. Returns the pose-graph fields of
    make_se2_pose_graph plus landmark truth/init and (br_i, br_lm,
    br_bearing, br_range) observation tables."""
    base = make_se2_pose_graph(
        n_states=n_states, dt=dt, qc=qc, odom_sigma_xy=odom_sigma_xy,
        odom_sigma_th=odom_sigma_th, loop_closure_prob=0.0, seed=seed,
    )
    rng = np.random.default_rng(seed + 1)
    poses = base["gt_pose"]
    lo = poses[:, :2].min(0) - 4.0
    hi = poses[:, :2].max(0) + 4.0
    landmarks = rng.uniform(lo, hi, size=(n_landmarks, 2))
    bi, bl, bb, br = [], [], [], []
    for k in range(n_states):
        d = landmarks - poses[k, :2]
        dist = np.linalg.norm(d, axis=-1)
        c, s = np.cos(poses[k, 2]), np.sin(poses[k, 2])
        for j in np.nonzero(dist < max_obs_range)[0]:
            local = np.array(
                [c * d[j, 0] + s * d[j, 1], -s * d[j, 0] + c * d[j, 1]]
            )
            bearing = np.arctan2(local[1], local[0])
            bi.append(k)
            bl.append(j)
            bb.append(bearing + rng.normal(scale=bearing_sigma))
            br.append(dist[j] + rng.normal(scale=range_sigma))
    base.update(
        {
            "landmarks_gt": landmarks,
            "init_landmarks": landmarks + rng.normal(scale=0.5,
                                                     size=landmarks.shape),
            "br_i": np.asarray(bi, np.int64),
            "br_lm": np.asarray(bl, np.int64),
            "br_bearing": np.asarray(bb),
            "br_range": np.asarray(br),
            "bearing_sigma": bearing_sigma,
            "range_sigma": range_sigma,
        }
    )
    return base


def make_se3_pose_graph(
    n_states: int = 100,
    dt: float = 0.5,
    qc: float = 0.05,
    odom_sigma_rot: float = 0.005,
    odom_sigma_trans: float = 0.02,
    loop_closure_every: int = 0,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """3D SE(3) pose graph with GP prior + odometry (BASELINE.json config 4
    structure, KITTI-like smooth vehicle motion). Returns rotation matrices
    gt_R (N,3,3), translations gt_t (N,3), body twists gt_vel (N,6) in
    [omega, v] order, noisy relative-pose odometry (odom_R, odom_t), optional
    loop closures, and odometry-integrated initial values."""
    rng = np.random.default_rng(seed)
    # smooth twist profile: forward motion + slowly varying yaw/pitch
    tgrid = np.linspace(0, 4 * np.pi, n_states)
    twists = np.zeros((n_states, 6))
    twists[:, 2] = 0.15 + 0.1 * np.sin(tgrid)  # yaw rate
    twists[:, 1] = 0.02 * np.cos(tgrid)  # pitch rate
    twists[:, 3] = 1.0 + 0.2 * np.cos(0.5 * tgrid)  # forward speed
    R = np.zeros((n_states, 3, 3))
    t = np.zeros((n_states, 3))
    R[0] = np.eye(3)
    for k in range(n_states - 1):
        dR, dtr = _se3_exp(dt * twists[k])
        R[k + 1] = R[k] @ dR
        t[k + 1] = R[k] @ dtr + t[k]
    odom_R = np.zeros((n_states - 1, 3, 3))
    odom_t = np.zeros((n_states - 1, 3))
    for k in range(n_states - 1):
        relR = R[k].T @ R[k + 1]
        relt = R[k].T @ (t[k + 1] - t[k])
        nR, nt = _se3_exp(
            np.concatenate(
                [
                    rng.normal(scale=odom_sigma_rot, size=3),
                    rng.normal(scale=odom_sigma_trans, size=3),
                ]
            )
        )
        odom_R[k] = relR @ nR
        odom_t[k] = relR @ nt + relt
    lc_i, lc_j, lc_R, lc_t = [], [], [], []
    if loop_closure_every:
        for j in range(loop_closure_every, n_states, loop_closure_every):
            i = j - loop_closure_every
            relR = R[i].T @ R[j]
            relt = R[i].T @ (t[j] - t[i])
            nR, nt = _se3_exp(
                np.concatenate(
                    [
                        rng.normal(scale=odom_sigma_rot, size=3),
                        rng.normal(scale=odom_sigma_trans, size=3),
                    ]
                )
            )
            lc_i.append(i)
            lc_j.append(j)
            lc_R.append(relR @ nR)
            lc_t.append(relR @ nt + relt)
    # init: integrate noisy odometry
    iR = np.zeros_like(R)
    it = np.zeros_like(t)
    iR[0] = R[0]
    it[0] = t[0]
    for k in range(n_states - 1):
        iR[k + 1] = iR[k] @ odom_R[k]
        it[k + 1] = iR[k] @ odom_t[k] + it[k]
    init_vel = twists + rng.normal(scale=0.05, size=twists.shape)
    return {
        "dt": dt,
        "qc": qc,
        "odom_sigma_rot": odom_sigma_rot,
        "odom_sigma_trans": odom_sigma_trans,
        "gt_R": R,
        "gt_t": t,
        "gt_vel": twists,
        "odom_R": odom_R,
        "odom_t": odom_t,
        "lc_i": np.asarray(lc_i, np.int64),
        "lc_j": np.asarray(lc_j, np.int64),
        "lc_R": np.asarray(lc_R).reshape(-1, 3, 3),
        "lc_t": np.asarray(lc_t).reshape(-1, 3),
        "init_R": iR,
        "init_t": it,
        "init_vel": init_vel,
    }


def _se3_exp(xi):
    """numpy SE(3) exp, [omega, v] ordering (ground-truth generation only)."""
    w, v = xi[:3], xi[3:]
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-9:
        R = np.eye(3) + W
        V = np.eye(3) + 0.5 * W
    else:
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th**2
        C = (th - np.sin(th)) / th**3
        R = np.eye(3) + A * W + B * (W @ W)
        V = np.eye(3) + B * W + C * (W @ W)
    return R, V @ v


# minimal f64 numpy SE(2) helpers (ground-truth generation only)
def _se2_exp(xi):
    vx, vy, w = xi
    if abs(w) < 1e-9:
        a, b = 1.0, w / 2.0
    else:
        a, b = np.sin(w) / w, (1 - np.cos(w)) / w
    return np.array([a * vx - b * vy, b * vx + a * vy, w])


def _se2_compose(p, q):
    c, s = np.cos(p[2]), np.sin(p[2])
    return np.array(
        [p[0] + c * q[0] - s * q[1], p[1] + s * q[0] + c * q[1], p[2] + q[2]]
    )


def _se2_between(p, q):
    c, s = np.cos(p[2]), np.sin(p[2])
    dx, dy = q[0] - p[0], q[1] - p[1]
    th = np.arctan2(np.sin(q[2] - p[2]), np.cos(q[2] - p[2]))
    return np.array([c * dx + s * dy, -s * dx + c * dy, th])
