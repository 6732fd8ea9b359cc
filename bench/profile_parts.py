"""Stage-level timing of the Plaza-scale LM hot path: linearize / assemble /
BCR-solve / error, each as its own jitted program (timed to a host-fetched
scalar). Guides Pallas kernel investment (SURVEY.md §7).

Run: python bench/profile_parts.py [--cpu] [--states N]
"""

import sys
import time

sys.path.insert(0, ".")
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain as chain_ops
from gpslam_tpu.ops import tridiag


def timed(name, f, *args, repeats=5):
    float(jnp.sum(jax.tree_util.tree_leaves(f(*args))[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(jax.tree_util.tree_leaves(f(*args))[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    n = 9700
    if "--states" in sys.argv:
        n = int(sys.argv[sys.argv.index("--states") + 1])
    data = synthetic.make_linear2d_range_slam(
        n_states=n, ranges_per_interval=0.36, seed=0
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    roles = chain_ops.build_role_table(graph, "state", "landmark")
    print(f"platform {jax.devices()[0].platform}, N={n}")

    err_fn = jax.jit(lambda v: graphlib.error(graph, v))
    timed("error", err_fn, values)

    lin_fn = jax.jit(lambda v: graphlib.linearize(graph, v))
    timed("linearize", lin_fn, values)

    lins = jax.jit(lambda v: graphlib.linearize(graph, v))(values)

    asm_fn = jax.jit(
        lambda l, v: chain_ops.assemble_chain(graph, l, v, roles, "state",
                                              "landmark")
    )
    timed("assemble_chain", asm_fn, lins, values)
    D, U, g_s, H_sl, H_ll, g_l = asm_fn(lins, values)

    solve_fn = jax.jit(
        lambda D, U, g_s, H_sl, H_ll, g_l: tridiag.schur_arrowhead_solve(
            D, U, g_s, H_sl, H_ll, g_l, jnp.float32(1e-5), False
        )
    )
    timed("bcr+schur solve", solve_fn, D, U, g_s, H_sl, H_ll, g_l)

    rhs1 = g_s[..., None]
    bcr_fn = jax.jit(lambda D, U, r: tridiag.bcr_solve(D, U, r))
    timed("bcr solve (k=1)", bcr_fn, D, U, rhs1)

    full_fn = jax.jit(
        lambda v: chain_ops.assemble_chain(
            graph, graphlib.linearize(graph, v), v, roles, "state", "landmark"
        )[0]
    )
    timed("linearize+assemble fused", full_fn, values)


if __name__ == "__main__":
    main()
