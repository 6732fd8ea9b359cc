"""SE(3) GP pose-SLAM model (BASELINE.json config 4; reference workload:
3D pose-SLAM with GaussianProcessPriorPose3, SURVEY.md §2.1 G5/G12).

Groups: "state" = se3_state() (pose (R, t), body twist R^6) for WNOA, or
se3_wnoj_state() (pose, twist, twist-acceleration) for the WNOJ prior
(config 4's "GP-WNOJ prior on a long trajectory").
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..factors import gp_priors, measurements
from ..graph import GraphBuilder, manifolds


def build(data, dtype=jnp.float32, prior="wnoa", state0_prior_sigma=0.01):
    """data: dict from io.synthetic.make_se3_pose_graph (or a g2o loader
    with the same keys). prior: 'wnoa' | 'wnoj'. Returns (graph, values)."""
    n = data["init_R"].shape[0]
    dt = float(data["dt"])
    qc = float(data["qc"])
    wnoj = prior == "wnoj"

    b = GraphBuilder()
    state_man = manifolds.se3_wnoj_state() if wnoj else manifolds.se3_state()
    b.add_group("state", state_man)
    sdim = state_man.dim  # 18 (wnoj) or 12 (wnoa)

    # prior on state 0
    prior_residual = _prior_se3_wnoj_state if wnoj else measurements.prior_se3_state
    prior_params = {
        "mu_R": jnp.asarray(data["init_R"][None, 0], dtype),
        "mu_t": jnp.asarray(data["init_t"][None, 0], dtype),
        "mu_vel": jnp.asarray(data["init_vel"][None, 0], dtype),
        "sqrt_info": jnp.asarray(
            (np.eye(sdim) / state0_prior_sigma)[None], dtype
        ),
    }
    if wnoj:
        prior_params["mu_acc"] = jnp.zeros((1, 6), dtype)
    b.add_factors(
        "prior", prior_residual, ("state",), (np.zeros((1,), np.int32),),
        prior_params, rdim=sdim,
    )

    qc_sqrt_info = np.eye(6) / math.sqrt(qc)
    gp_residual = gp_priors.gp_prior_se3_wnoj if wnoj else gp_priors.gp_prior_se3
    b.add_factors(
        "gp_prior", gp_residual, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "dt": jnp.full((n - 1,), dt, dtype),
            "qc_sqrt_info": jnp.asarray(
                np.broadcast_to(qc_sqrt_info, (n - 1, 6, 6)), dtype
            ),
        },
        rdim=18 if wnoj else 12,
    )

    odom_sqrt_info = np.diag(
        [1.0 / float(data["odom_sigma_rot"])] * 3
        + [1.0 / float(data["odom_sigma_trans"])] * 3
    )
    b.add_factors(
        "odometry", measurements.between_se3, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "z_R": jnp.asarray(data["odom_R"], dtype),
            "z_t": jnp.asarray(data["odom_t"], dtype),
            "sqrt_info": jnp.asarray(
                np.broadcast_to(odom_sqrt_info, (n - 1, 6, 6)), dtype
            ),
        },
        rdim=6,
    )

    if data.get("lc_i") is not None and data["lc_i"].shape[0]:
        m = data["lc_i"].shape[0]
        b.add_factors(
            "loop_closure", measurements.between_se3, ("state", "state"),
            (data["lc_i"], data["lc_j"]),
            {
                "z_R": jnp.asarray(data["lc_R"], dtype),
                "z_t": jnp.asarray(data["lc_t"], dtype),
                "sqrt_info": jnp.asarray(
                    np.broadcast_to(odom_sqrt_info, (m, 6, 6)), dtype
                ),
            },
            rdim=6,
        )

    pose = (
        jnp.asarray(data["init_R"], dtype),
        jnp.asarray(data["init_t"], dtype),
    )
    vel = jnp.asarray(data["init_vel"], dtype)
    if wnoj:
        acc = jnp.zeros((n, 6), dtype)
        values = {"state": (pose, vel, acc)}
    else:
        values = {"state": (pose, vel)}
    return b.build(), values


def _prior_se3_wnoj_state(state, params):
    """Prior on the full (pose, twist, acc) WNOJ chain node."""
    from ..lie import se3

    (R, t), vel, acc = state
    r = jnp.concatenate(
        [
            se3.local_coordinates(params["mu_R"], params["mu_t"], R, t),
            vel - params["mu_vel"],
            acc - params["mu_acc"],
        ],
        -1,
    )
    return params["sqrt_info"] @ r
