"""Plaza-style linear-WNOA range-only SLAM model (BASELINE.json config 2;
reference workload: Yan et al. RAS 2017, SURVEY.md §2.1 G9/G12).

Variable groups:
  "state"     linear_state(2): (position R^2, velocity R^2), chain-node dim 4
  "landmark"  Vector(2)

Factor batches:
  prior        on state 0 (anchors the gauge)
  gp_prior     WNOA chain priors between consecutive states
  odometry     relative-position between factors
  interp_range GP-interpolated ranges at tau in (t_i, t_{i+1}) — the G9 factor
  lm_prior     weak landmark priors (well-posedness for rarely-seen beacons)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..factors import gp_priors, linearizers, measurements
from ..graph import GraphBuilder, manifolds


def build(data, dtype=jnp.float32, lm_prior_sigma: float = 100.0,
          state0_prior_sigma: float = 0.01, prior: str = "wnoa"):
    """data: dict from io.synthetic.make_linear2d_range_slam (or a real
    dataset loader with the same keys). prior: 'wnoa' | 'wnoj' (constant
    velocity vs constant acceleration). Returns (graph, initial_values)."""
    n = data["init_pos"].shape[0]
    n_lm = data["init_landmarks"].shape[0]
    dt = float(data["dt"])
    qc = float(data["qc"])
    wnoj = prior == "wnoj"
    sdim = 6 if wnoj else 4

    b = GraphBuilder()
    b.add_group(
        "state",
        manifolds.linear_wnoj_state(2) if wnoj else manifolds.linear_state(2),
    )
    b.add_group("landmark", manifolds.Vector(2))

    # prior on state 0 (anchor at the surveyed start if provided)
    if "anchor_pos" in data:
        mu0 = np.concatenate([data["anchor_pos"], data["anchor_vel"]])
    else:
        mu0 = np.concatenate([data["init_pos"][0], data["init_vel"][0]])
    if wnoj:
        mu0 = np.concatenate([mu0, np.zeros(2)])
    b.add_factors(
        "prior",
        measurements.prior_linear_state,
        ("state",),
        (np.zeros((1,), np.int32),),
        {
            "mu": jnp.asarray(mu0[None], dtype),
            "sqrt_info": jnp.asarray(
                (np.eye(sdim) / state0_prior_sigma)[None], dtype
            ),
        },
        rdim=sdim,
        linearizer=None if wnoj else linearizers.prior_linear_state,
    )

    # GP chain (WNOA or WNOJ)
    qc_sqrt_info = np.eye(2) / math.sqrt(qc)
    b.add_factors(
        "gp_prior",
        gp_priors.gp_prior_linear_wnoj if wnoj else gp_priors.gp_prior_linear,
        ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "dt": jnp.full((n - 1,), dt, dtype),
            "qc_sqrt_info": jnp.asarray(
                np.broadcast_to(qc_sqrt_info, (n - 1, 2, 2)), dtype
            ),
        },
        rdim=sdim,
        linearizer=None if wnoj else linearizers.gp_prior_linear,
    )

    # odometry between factors
    odom_sqrt_info = np.eye(2) / float(data["odom_sigma"])
    b.add_factors(
        "odometry",
        measurements.between_linear,
        ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {
            "z": jnp.asarray(data["odom_z"], dtype),
            "sqrt_info": jnp.asarray(
                np.broadcast_to(odom_sqrt_info, (n - 1, 2, 2)), dtype
            ),
        },
        rdim=2,
        linearizer=None if wnoj else linearizers.between_linear,
    )

    # interpolated range factors
    m = data["range_i"].shape[0]
    if m:
        b.add_factors(
            "interp_range",
            measurements.interp_range_linear_wnoj if wnoj
            else measurements.interp_range_linear,
            ("state", "state", "landmark"),
            (data["range_i"], data["range_i"] + 1, data["range_lm"]),
            {
                "dt": jnp.full((m,), dt, dtype),
                "tau": jnp.asarray(data["range_tau"], dtype),
                "z": jnp.asarray(data["range_z"], dtype),
                "inv_sigma": jnp.full((m,), 1.0 / float(data["range_sigma"]), dtype),
            },
            rdim=1,
            linearizer=None if wnoj else linearizers.interp_range_linear,
        )

    # weak landmark priors
    b.add_factors(
        "lm_prior",
        measurements.prior_vector,
        ("landmark",),
        (np.arange(n_lm),),
        {
            "mu": jnp.asarray(data["init_landmarks"], dtype),
            "sqrt_info": jnp.asarray(
                np.broadcast_to(np.eye(2) / lm_prior_sigma, (n_lm, 2, 2)), dtype
            ),
        },
        rdim=2,
        linearizer=linearizers.prior_vector,
    )

    state = (
        jnp.asarray(data["init_pos"], dtype),
        jnp.asarray(data["init_vel"], dtype),
    )
    if wnoj:
        state = state + (jnp.zeros((n, 2), dtype),)
    values = {
        "state": state,
        "landmark": jnp.asarray(data["init_landmarks"], dtype),
    }
    return b.build(), values
