"""Factor Jacobian evals/s/chip — the BASELINE.json primary micro-metric.

Measures the linearize stage alone (whitened residual + all slot Jacobians
for every factor, SURVEY.md §3.1 hot loop #1) on the Plaza-scale problem,
amortized inside one jitted fori_loop so the tunnel RTT doesn't dominate.
Reports evals/s for the analytic-linearizer path and the jacfwd (AD) path.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d

REPS = 32


def main():
    data = synthetic.make_linear2d_range_slam(
        n_states=9700, ranges_per_interval=0.36, seed=0
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    n_factors = sum(b.size for b in graph.batches)
    print(f"backend={jax.default_backend()}  factors={n_factors}")

    # linearizer is a non-pytree field on the flax struct — rebuild batches
    from gpslam_tpu.graph.graph import FactorBatch

    batches_ad = tuple(
        FactorBatch(idx=b.idx, params=b.params, name=b.name,
                    residual=b.residual, groups=b.groups, rdim=b.rdim,
                    mask=b.mask, robust=b.robust, linearizer=None)
        for b in graph.batches
    )
    graph_ad = graph.replace(batches=batches_ad)

    def bench(g, label):
        @jax.jit
        def run(g, values):
            def body(i, acc):
                vals = {k: jax.tree_util.tree_map(
                    lambda a: a + acc * 1e-12, v) for k, v in values.items()}
                lins = graphlib.linearize(g, vals)
                return acc + sum(jnp.sum(l.r) for l in lins)
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((), jnp.float32))

        float(run(g, values))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(g, values))
            best = min(best, time.perf_counter() - t0)
        per_pass = best / REPS
        rate = n_factors / per_pass
        print(f"{label:24s}: {per_pass*1e3:7.3f} ms/linearize  "
              f"{rate/1e6:8.1f} M factor-evals/s/chip")
        return rate

    bench(graph, "analytic linearizers")
    bench(graph_ad, "jacfwd (AD)")


if __name__ == "__main__":
    main()
