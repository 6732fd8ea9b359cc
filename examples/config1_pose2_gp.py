"""BASELINE config 1: small synthetic 2D pose-graph (~100 states) with
GP-WNOA prior, batch solve.

Run: python examples/config1_pose2_gp.py  [--cpu]
"""

import sys

sys.path.insert(0, ".")
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.solve import lm_solve


def main():
    data = synthetic.make_se2_pose_graph(n_states=100, seed=0)
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    vals, stats = lm_solve(graph, values, LMConfig())
    est = np.asarray(vals["state"][0])
    gt = data["gt_pose"]
    rmse = np.sqrt(((est[:, :2] - gt[:, :2]) ** 2).sum(-1).mean())
    print(
        f"chi2 {float(stats.error0):.1f} -> {float(stats.error):.3f} in "
        f"{int(stats.iterations)} iterations (converged={bool(stats.converged)})"
    )
    print(f"position RMSE vs ground truth: {rmse:.3f} m")


if __name__ == "__main__":
    main()
