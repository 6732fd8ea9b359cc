"""SE(2) GP pose-SLAM model (BASELINE.json configs 1/3; reference workload:
2D pose-SLAM demos with GaussianProcessPriorPose2, SURVEY.md §2.1 G4/G12).

Groups: "state" = se2_state() (pose, body velocity), optional "landmark".
Factors: state-0 prior, GP-WNOA chain, odometry between factors, loop
closures, optional bearing-range landmark measurements.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..factors import gp_priors, measurements
from ..graph import GraphBuilder, manifolds


def build(data, dtype=jnp.float32, state0_prior_sigma: float = 0.01):
    """data: dict from io.synthetic.make_se2_pose_graph. Returns
    (graph, initial_values)."""
    n = data["init_pose"].shape[0]
    dt = float(data["dt"])
    qc = float(data["qc"])

    b = GraphBuilder()
    b.add_group("state", manifolds.se2_state())

    b.add_factors(
        "prior",
        measurements.prior_se2_state,
        ("state",),
        (np.zeros((1,), np.int32),),
        {
            "mu_pose": jnp.asarray(data["init_pose"][None, 0], dtype),
            "mu_vel": jnp.asarray(data["init_vel"][None, 0], dtype),
            "sqrt_info": jnp.asarray(
                (np.eye(6) / state0_prior_sigma)[None], dtype
            ),
        },
        rdim=6,
    )

    qc_sqrt_info = np.eye(3) / math.sqrt(qc)
    b.add_factors(
        "gp_prior",
        gp_priors.gp_prior_se2,
        ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "dt": jnp.full((n - 1,), dt, dtype),
            "qc_sqrt_info": jnp.asarray(
                np.broadcast_to(qc_sqrt_info, (n - 1, 3, 3)), dtype
            ),
        },
        rdim=6,
    )

    odom_sqrt_info = np.diag(
        [1.0 / float(data["odom_sigma_xy"])] * 2 + [1.0 / float(data["odom_sigma_th"])]
    )
    odom_A = data.get("odom_sqrt_info")
    if odom_A is None:
        odom_A = np.broadcast_to(odom_sqrt_info, (n - 1, 3, 3))
    b.add_factors(
        "odometry",
        measurements.between_se2,
        ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "z": jnp.asarray(data["odom_z"], dtype),
            "sqrt_info": jnp.asarray(odom_A, dtype),
        },
        rdim=3,
    )

    if data["lc_i"].shape[0]:
        m = data["lc_i"].shape[0]
        lc_A = data.get("lc_sqrt_info")
        if lc_A is None:
            lc_A = np.broadcast_to(odom_sqrt_info, (m, 3, 3))
        b.add_factors(
            "loop_closure",
            measurements.between_se2,
            ("state", "state"),
            (data["lc_i"], data["lc_j"]),
            {
                "z": jnp.asarray(data["lc_z"], dtype),
                "sqrt_info": jnp.asarray(lc_A, dtype),
            },
            rdim=3,
        )

    values = {
        "state": (
            jnp.asarray(data["init_pose"], dtype),
            jnp.asarray(data["init_vel"], dtype),
        ),
    }
    return b.build(), values


def data_from_g2o(loaded, dt: float = 1.0, qc: float = 0.5):
    """Adapt io.formats.load_g2o_se2/load_toro_se2 output to the build()
    data dict: consecutive-index edges become odometry, the rest loop
    closures; body velocities initialized from odometry increments / dt.
    Per-edge sqrt-information matrices are passed through (heterogeneous
    noise preserved); the scalar odom_sigma_* fields carry fallback means
    for builders without per-edge support.
    """
    init = loaded["init_pose"]
    n = init.shape[0]
    ei, ej, ez = loaded["edges_i"], loaded["edges_j"], loaded["edges_z"]
    A = loaded["edges_sqrt_info"]
    odom = np.zeros((n - 1, 3))
    odom_info = np.zeros((n - 1, 3, 3))
    seen = np.zeros(n - 1, bool)
    lc_i, lc_j, lc_z, lc_info = [], [], [], []
    for k in range(ei.shape[0]):
        if ej[k] == ei[k] + 1 and not seen[ei[k]]:
            odom[ei[k]] = ez[k]
            odom_info[ei[k]] = A[k]
            seen[ei[k]] = True
        else:
            lc_i.append(ei[k])
            lc_j.append(ej[k])
            lc_z.append(ez[k])
            lc_info.append(A[k])
    # unobserved intervals get the mean information (keeps chain connected)
    mean_info = A.mean(0)
    odom_info[~seen] = mean_info
    sig = 1.0 / np.clip(np.mean(A[:, [0, 1, 2], [0, 1, 2]], axis=0), 1e-6, None)
    vel = np.zeros((n, 3))
    vel[:-1] = odom / dt
    vel[-1] = vel[-2]
    return {
        "dt": dt,
        "qc": qc,
        "odom_sigma_xy": float(0.5 * (sig[0] + sig[1])),
        "odom_sigma_th": float(sig[2]),
        "odom_sqrt_info": odom_info,
        "gt_pose": init,
        "gt_vel": vel,
        "odom_z": odom,
        "lc_i": np.asarray(lc_i, np.int64),
        "lc_j": np.asarray(lc_j, np.int64),
        "lc_z": np.asarray(lc_z).reshape(-1, 3),
        "lc_sqrt_info": np.asarray(lc_info).reshape(-1, 3, 3),
        "init_pose": init,
        "init_vel": vel,
    }


def build_landmark_slam(data, dtype=jnp.float32, state0_prior_sigma=0.01,
                        lm_prior_sigma: float = 100.0):
    """BASELINE.json config 3: SE(2) GP trajectory + odometry + bearing-range
    landmark observations (+ weak landmark priors for well-posedness).

    data: dict from io.synthetic.make_se2_landmark_slam.
    Fits the chain+arrowhead solver (bearing-range touches one state +
    one landmark) and chain_marginals for covariance recovery.
    """
    n = data["init_pose"].shape[0]
    n_lm = data["init_landmarks"].shape[0]
    dt = float(data["dt"])
    qc = float(data["qc"])

    b = GraphBuilder()
    b.add_group("state", manifolds.se2_state())
    b.add_group("landmark", manifolds.Vector(2))

    b.add_factors(
        "prior", measurements.prior_se2_state, ("state",),
        (np.zeros((1,), np.int32),),
        {
            "mu_pose": jnp.asarray(data["init_pose"][None, 0], dtype),
            "mu_vel": jnp.asarray(data["init_vel"][None, 0], dtype),
            "sqrt_info": jnp.asarray((np.eye(6) / state0_prior_sigma)[None], dtype),
        },
        rdim=6,
    )
    qc_sqrt_info = np.eye(3) / math.sqrt(qc)
    b.add_factors(
        "gp_prior", gp_priors.gp_prior_se2, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "dt": jnp.full((n - 1,), dt, dtype),
            "qc_sqrt_info": jnp.asarray(
                np.broadcast_to(qc_sqrt_info, (n - 1, 3, 3)), dtype
            ),
        },
        rdim=6,
    )
    odom_sqrt_info = np.diag(
        [1.0 / float(data["odom_sigma_xy"])] * 2 + [1.0 / float(data["odom_sigma_th"])]
    )
    b.add_factors(
        "odometry", measurements.between_se2, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "z": jnp.asarray(data["odom_z"], dtype),
            "sqrt_info": jnp.asarray(
                np.broadcast_to(odom_sqrt_info, (n - 1, 3, 3)), dtype
            ),
        },
        rdim=3,
    )
    m = data["br_i"].shape[0]
    if m:
        b.add_factors(
            "bearing_range", measurements.bearing_range_se2,
            ("state", "landmark"),
            (data["br_i"], data["br_lm"]),
            {
                "z_bearing": jnp.asarray(data["br_bearing"], dtype),
                "z_range": jnp.asarray(data["br_range"], dtype),
                "inv_sigma_bearing": jnp.full(
                    (m,), 1.0 / float(data["bearing_sigma"]), dtype
                ),
                "inv_sigma_range": jnp.full(
                    (m,), 1.0 / float(data["range_sigma"]), dtype
                ),
            },
            rdim=2,
        )
    b.add_factors(
        "lm_prior", measurements.prior_vector, ("landmark",),
        (np.arange(n_lm),),
        {
            "mu": jnp.asarray(data["init_landmarks"], dtype),
            "sqrt_info": jnp.asarray(
                np.broadcast_to(np.eye(2) / lm_prior_sigma, (n_lm, 2, 2)), dtype
            ),
        },
        rdim=2,
    )
    values = {
        "state": (
            jnp.asarray(data["init_pose"], dtype),
            jnp.asarray(data["init_vel"], dtype),
        ),
        "landmark": jnp.asarray(data["init_landmarks"], dtype),
    }
    return b.build(), values
