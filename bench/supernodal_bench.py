"""Supernodal Cholesky numeric-phase throughput (BASELINE.md row:
"Supernodal Cholesky GFLOP/s vs chip speed-of-light").

Factorizes a loop-closure SE(2) pose graph's assembled block Hessian with
the level-batched supernodal solver, amortized in a fori_loop; reports
wall-clock per factorization and effective GFLOP/s (FLOPs counted from the
static schedules: 2b^3 per update triple, b^3/3 + b^3 per column
factor+TRSM block).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver
from gpslam_tpu.ops.supernodal import SupernodalSolver

REPS = 16


def main(n_states=600, w_max=0):
    data = synthetic.make_se2_pose_graph(n_states=n_states, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    sn = (AmalgamatedSupernodalSolver(graph, values, w_max=w_max)
          if w_max > 1 else SupernodalSolver(graph, values))
    b = sn.b
    flops = 0
    for (u_dst, _, _), (cols, offs, _) in zip(sn.upd_sched, sn.col_sched):
        flops += 2 * b**3 * len(u_dst)
        flops += (b**3 // 3) * len(cols) + b**3 * len(offs)
    lins = graphlib.linearize(graph, values)
    blocks, _ = sn.assemble(graph, lins, values, jnp.float32(0.01))

    @jax.jit
    def run(blocks):
        def body(i, acc):
            L = sn.factorize(blocks + acc * 1e-12)
            return acc + jnp.sum(L[0])
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    float(run(blocks))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(blocks))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(f"backend={jax.default_backend()} n_states={n_states} "
          f"levels={len(sn.levels)} blocks={sn.n_blocks} b={b}")
    print(f"numeric factorization: {per*1e3:.2f} ms "
          f"({flops/per/1e9:.1f} GFLOP/s, {flops/1e6:.1f} MFLOP/pass)")

    # selected inverse (marginal covariances, S12) over the same schedules
    L = sn.factorize(blocks)

    @jax.jit
    def run_sel(L):
        def body(i, acc):
            S = sn.selected_inverse(L + acc * 1e-12)
            return acc + jnp.sum(S[0])
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    float(run_sel(L))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_sel(L))
        best = min(best, time.perf_counter() - t0)
    print(f"selected inverse (all marginals): {best/REPS*1e3:.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
