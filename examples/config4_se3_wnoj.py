"""BASELINE config 4: 3D SE(3) pose SLAM with GP-WNOJ prior on a long
trajectory (KITTI-odometry-scale structure).

Run: python examples/config4_se3_wnoj.py [--cpu] [--states N]
"""

import sys
import time

sys.path.insert(0, ".")
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose3_slam
from gpslam_tpu.solve import lm_solve


def main():
    n = 500
    if "--states" in sys.argv:
        n = int(sys.argv[sys.argv.index("--states") + 1])
    data = synthetic.make_se3_pose_graph(n_states=n, seed=0,
                                         loop_closure_every=50)
    graph, values = pose3_slam.build(data, dtype=jnp.float32, prior="wnoj")
    # loop closures break the chain structure; the supernodal sparse
    # Cholesky (min-degree ordering + level-batched factorization) handles
    # this exactly without a dense Hessian
    from gpslam_tpu.ops.supernodal import SupernodalSolver

    sn = SupernodalSolver(graph, values)
    solve = jax.jit(
        lambda g, v: lm_solve(g, v, LMConfig(max_iterations=60),
                              solver=sn.solver)
    )
    vals, stats = solve(graph, values)
    jax.block_until_ready(stats.error)
    t0 = time.perf_counter()
    vals, stats = solve(graph, values)
    jax.block_until_ready(stats.error)
    dt = time.perf_counter() - t0
    est_t = np.asarray(vals["state"][0][1])
    err = np.linalg.norm(est_t - data["gt_t"], axis=-1).mean()
    ierr = np.linalg.norm(data["init_t"] - data["gt_t"], axis=-1).mean()
    print(f"{n} SE(3) states (WNOJ, 18-dim chain nodes) on "
          f"{jax.devices()[0].platform}")
    print(f"chi2 {float(stats.error0):.0f} -> {float(stats.error):.1f} in "
          f"{int(stats.iterations)} iterations; steady solve {dt*1e3:.1f} ms")
    print(f"mean translation error: init {ierr:.3f} m -> {err:.3f} m")


if __name__ == "__main__":
    main()
