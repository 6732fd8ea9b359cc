"""Multi-hypothesis batched solves (BASELINE "vmapped chain dimension", P6):
S independent Plaza-style LM solves as one vmapped program on one chip.

Run: python bench/multiseed.py [--cpu] [--seeds S] [--states N]
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
from gpslam_tpu.parallel import lm_solve_multiseed


def main():
    seeds = 16
    n = 2000
    if "--seeds" in sys.argv:
        seeds = int(sys.argv[sys.argv.index("--seeds") + 1])
    if "--states" in sys.argv:
        n = int(sys.argv[sys.argv.index("--states") + 1])
    data = synthetic.make_linear2d_range_slam(
        n_states=n, ranges_per_interval=0.36, seed=0
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    solver = chain.make_chain_solver(graph)
    key = jax.random.PRNGKey(0)
    leaves, treedef = jax.tree_util.tree_flatten(values)
    ks = jax.random.split(key, len(leaves))
    values_b = jax.tree_util.tree_unflatten(
        treedef,
        [l[None] + 0.2 * jax.random.normal(k, (seeds, *l.shape), l.dtype)
         for l, k in zip(leaves, ks)],
    )
    cfg = LMConfig(max_iterations=30)
    f = jax.jit(lambda v: lm_solve_multiseed(graph, v, cfg, solver=solver)[1].error)
    errs = f(values_b)
    float(errs.sum())  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        errs = f(values_b)
        float(errs.sum())
        best = min(best, time.perf_counter() - t0)
    e = np.asarray(errs)
    print(f"platform {jax.devices()[0].platform}: {seeds} x {n}-state LM solves "
          f"in {best*1e3:.1f} ms ({best/seeds*1e3:.2f} ms/solve)")
    print(f"chi2 spread across seeds: [{e.min():.1f}, {e.max():.1f}]")


if __name__ == "__main__":
    main()
