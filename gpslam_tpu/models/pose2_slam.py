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
    b.add_factors(
        "odometry",
        measurements.between_se2,
        ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "z": jnp.asarray(data["odom_z"], dtype),
            "sqrt_info": jnp.asarray(
                np.broadcast_to(odom_sqrt_info, (n - 1, 3, 3)), dtype
            ),
        },
        rdim=3,
    )

    if data["lc_i"].shape[0]:
        m = data["lc_i"].shape[0]
        b.add_factors(
            "loop_closure",
            measurements.between_se2,
            ("state", "state"),
            (data["lc_i"], data["lc_j"]),
            {
                "z": jnp.asarray(data["lc_z"], dtype),
                "sqrt_info": jnp.asarray(
                    np.broadcast_to(odom_sqrt_info, (m, 3, 3)), dtype
                ),
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
