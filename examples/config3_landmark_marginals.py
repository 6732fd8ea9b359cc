"""BASELINE config 3: 2D landmark SLAM with odometry + bearing-range factors
and marginal covariance recovery.

Run: python examples/config3_landmark_marginals.py [--cpu]
"""

import sys

sys.path.insert(0, ".")
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpslam_tpu import marginals
from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops import chain
from gpslam_tpu.solve import lm_solve


def main():
    data = synthetic.make_se2_landmark_slam(n_states=100, n_landmarks=10,
                                            seed=0)
    graph, values = pose2_slam.build_landmark_slam(data, dtype=jnp.float32)
    solver = chain.make_chain_solver(graph)
    vals, stats = lm_solve(graph, values, LMConfig(), solver=solver)
    print(f"chi2 {float(stats.error0):.0f} -> {float(stats.error):.1f} in "
          f"{int(stats.iterations)} iterations")
    cov = marginals.chain_marginals(graph, vals)
    pose_sig = np.sqrt(
        np.trace(np.asarray(cov["state"])[:, :2, :2], axis1=-2, axis2=-1)
    )
    lm_sig = np.sqrt(np.trace(np.asarray(cov["landmark"]), axis1=-2, axis2=-1))
    lm_err = np.linalg.norm(
        np.asarray(vals["landmark"]) - data["landmarks_gt"], axis=-1
    )
    print(f"pose position sigma: min {pose_sig.min():.4f} max {pose_sig.max():.4f}")
    print("landmark  error :", lm_err.round(3))
    print("landmark  sigma :", lm_sig.round(3))
    consistent = (lm_err < 3.0 * lm_sig + 1e-3).mean()
    print(f"landmarks within 3-sigma: {100 * consistent:.0f}%")

    # cross-check: the general-graph path (blocked Takahashi selected
    # inverse over the amalgamated supernodal schedules) must agree with the
    # chain+arrowhead recurrences above
    cov_sn = marginals.supernodal_marginals(graph, vals)
    dmax = max(
        float(np.abs(np.asarray(cov_sn[g]) - np.asarray(cov[g])).max())
        for g in cov
    )
    print(f"supernodal selected-inverse vs chain recurrences: "
          f"max|diff| = {dmax:.2e}")


if __name__ == "__main__":
    main()
