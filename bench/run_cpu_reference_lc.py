"""f64 SuperLU CPU reference LM on the SE(2) loop-closure pose graph — the
denominator for the general-sparse (supernodal) path benchmarks.

Run: JAX_PLATFORMS is pinned in-process; same methodology as
bench/cpu_reference.py (library factor kernels in f64 on the CPU backend,
scipy CSC assembly, SuperLU with reused symbolic pattern, GTSAM-default LM
schedule). Prints one JSON line.
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "cpu_reference", os.path.join(here, "cpu_reference.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import pose2_slam

    data = synthetic.make_se2_pose_graph(n_states=n_states, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    info = mod.solve_cpu_sparse(graph, values, max_iterations=30)
    info["n_states"] = n_states
    info["n_loop_closures"] = int(data["lc_i"].shape[0])
    print(json.dumps(info))


if __name__ == "__main__":
    main()
