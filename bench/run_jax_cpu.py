"""Same-code JAX-CPU denominator in a subprocess.

Builds the same synthetic problem and runs the SAME library LM (chain
BCR+Schur solver, f32) on the host CPU backend — the round-1 "our own code
on the host" denominator, at arbitrary scale. A subprocess is required
because (a) the axon sitecustomize hook pins the platform at interpreter
startup (config.update is the only override) and (b) building the problem
in a TPU-backed process would round-trip every array through the tunnel.

Prints one JSON line: {"wall_s": ..., "iterations": ..., "chi2": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 9700
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import linear2d
    from gpslam_tpu.ops import chain
    from gpslam_tpu.solve import lm_solve

    data = synthetic.make_linear2d_range_slam(
        n_states=n_states, ranges_per_interval=0.36, seed=0
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    solver = chain.make_chain_solver(graph, use_pallas=False)
    cfg = LMConfig(max_iterations=40)
    solve = jax.jit(lambda g, v: lm_solve(g, v, cfg, solver=solver))
    vals, stats = solve(graph, values)
    float(stats.error)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        vals, stats = solve(graph, values)
        float(stats.error)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "wall_s": best,
        "iterations": int(stats.iterations),
        "chi2": float(stats.error),
    }))


if __name__ == "__main__":
    main()
