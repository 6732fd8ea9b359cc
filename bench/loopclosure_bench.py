"""Loop-closure graph benchmark (VERDICT r1 item 7): exact supernodal
sparse Cholesky vs block-Jacobi PCG on a 10k-state SE(2) pose graph, plus
the dense-top-of-tree effect on the numeric factorization.

Run: python bench/loopclosure_bench.py [n_states] [loops_frac]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.ops import pcg as pcg_ops
from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver
from gpslam_tpu.solve import lm_solve


def _time_lm(graph, values, solver, reps=2):
    cfg = LMConfig(max_iterations=30)
    f = jax.jit(lambda g, v: lm_solve(g, v, cfg, solver=solver))
    vals, st = f(graph, values)
    float(st.error)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        vals, st = f(graph, values)
        float(st.error)
        best = min(best, time.perf_counter() - t0)
    return best, st


def _time_factor(sn, blocks, reps=8):
    @jax.jit
    def run(blocks):
        def body(i, acc):
            L = sn.factorize(blocks)
            leaf = jax.tree_util.tree_leaves(L)[0]
            return acc + leaf.reshape(-1)[0] * 1e-20

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    float(run(blocks))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(blocks))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    data = synthetic.make_se2_pose_graph(n_states=n_states, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    n_loops = sum(
        int(b.size) for b in graph.batches if "loop" in b.name
    )
    print(f"backend={jax.default_backend()} n_states={n_states} "
          f"(~{n_loops} loop closures)", flush=True)

    lins = graphlib.linearize(graph, values)

    for dt_panels in (0, 32):
        sn = AmalgamatedSupernodalSolver(
            graph, values, ordering="nd", w_max=8, mode="stream",
            dense_tail=dt_panels,
        )
        blocks, _ = sn.assemble(graph, lins, values, jnp.float32(0.01))
        t = _time_factor(sn, blocks)
        print(f"supernodal factorization (nd, w8, stream, dense_tail="
              f"{dt_panels} panels, {len(sn.levels)} levels): "
              f"{t*1e3:.1f} ms", flush=True)
        t_lm, st = _time_lm(graph, values, sn.solver)
        print(f"  full LM: {t_lm*1e3:.1f} ms, chi2 {float(st.error0):.1f} -> "
              f"{float(st.error):.2f} in {int(st.iterations)} iters "
              f"(converged={bool(st.converged)})", flush=True)

    pcg = pcg_ops.make_pcg_solver()
    t_pcg, st_pcg = _time_lm(graph, values, pcg)
    print(f"block-Jacobi PCG LM: {t_pcg*1e3:.1f} ms, chi2 "
          f"{float(st_pcg.error0):.1f} -> {float(st_pcg.error):.2f} in "
          f"{int(st_pcg.iterations)} iters "
          f"(converged={bool(st_pcg.converged)})", flush=True)


if __name__ == "__main__":
    main()
