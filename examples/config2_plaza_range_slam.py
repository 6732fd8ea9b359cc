"""BASELINE config 2: Plaza1-style range-only SLAM with GP interpolation
factors at ranging times, full-batch LM with the BCR+Schur chain solver.

Uses the synthetic Plaza-scale dataset (the real Autonomous Lawnmower files
are unreachable in this zero-egress environment; pass a Plaza text export via
--data to run on real data through io.formats.load_plaza).

Run: python examples/config2_plaza_range_slam.py [--cpu] [--states N]
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
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.solve import lm_solve


def main():
    n = 9700
    if "--states" in sys.argv:
        n = int(sys.argv[sys.argv.index("--states") + 1])
    data = synthetic.make_linear2d_range_slam(
        n_states=n, ranges_per_interval=0.36, seed=0
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    solver = chain.make_chain_solver(graph)
    solve = jax.jit(lambda g, v: lm_solve(g, v, LMConfig(max_iterations=40),
                                          solver=solver))
    vals, stats = solve(graph, values)
    jax.block_until_ready(stats.error)
    t0 = time.perf_counter()
    vals, stats = solve(graph, values)
    jax.block_until_ready(stats.error)
    dt = time.perf_counter() - t0
    pos = np.asarray(vals["state"][0])
    rmse = np.sqrt(((pos - data["gt_pos"]) ** 2).sum(-1).mean())
    print(
        f"{n} states, {sum(b.size for b in graph.batches)} factors on "
        f"{jax.devices()[0].platform}"
    )
    print(
        f"chi2 {float(stats.error0):.0f} -> {float(stats.error):.1f} in "
        f"{int(stats.iterations)} iterations; steady-state solve {dt*1e3:.1f} ms"
    )
    print(f"trajectory RMSE {rmse:.3f} m; landmark errors "
          f"{np.linalg.norm(np.asarray(vals['landmark']) - data['landmarks_gt'], axis=1).round(3)}")

    # continuous-time payoff (reference §3.4): query the posterior at times
    # BETWEEN the estimation knots — mean and full Laplace covariance
    from gpslam_tpu import query

    dt_knot = float(data["dt"])
    kt = jnp.asarray(np.arange(n) * dt_knot, jnp.float32)
    tq = jnp.asarray((np.arange(8) + 0.37) * dt_knot * (n // 9), jnp.float32)
    (xq, vq), Sq = query.query_posterior_linear(
        graph, vals, tq, kt, float(data["qc"])
    )
    sd = np.sqrt(np.asarray(jnp.diagonal(Sq, axis1=-2, axis2=-1))[:, :2])
    for i in range(len(tq)):
        print(f"  t={float(tq[i]):8.2f}s  p=({float(xq[i,0]):7.2f}, "
              f"{float(xq[i,1]):7.2f}) m  1-sigma=({sd[i,0]:.3f}, {sd[i,1]:.3f}) m")

    # JOINT posterior across query times (GTSAM JointMarginal, continuous
    # time): correlation between two nearby between-knot query points
    t2 = jnp.asarray([float(tq[0]), float(tq[0]) + 0.4 * dt_knot], jnp.float32)
    _, Jq = query.query_joint_posterior_linear(
        graph, vals, t2, kt, float(data["qc"])
    )
    c = np.asarray(Jq[0, 1]); s0 = np.asarray(Jq[0, 0]); s1 = np.asarray(Jq[1, 1])
    rho = c[0, 0] / np.sqrt(s0[0, 0] * s1[0, 0])
    print(f"  joint query: corr(x({float(t2[0]):.2f}s), x({float(t2[1]):.2f}s))"
          f" = {rho:.3f}")


if __name__ == "__main__":
    main()
