"""Run the f64 scipy sparse-direct CPU reference LM (GTSAM stand-in).

Run in a subprocess with:
  JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python bench/run_cpu_reference.py [n_states]

Prints one JSON line with wall-clock / chi^2 / iterations. This is the
benchmark denominator (see bench/cpu_reference.py for methodology).
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_cpu_reference():
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "cpu_reference", os.path.join(here, "cpu_reference.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 9700
    import jax

    # The axon sitecustomize hook pre-imports jax and pins the platform, so
    # env vars are too late here — config.update still works (backend not
    # yet initialized). Same mechanism as conftest.py.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import bench as benchmod  # repo-root bench.py

    graph, values, _ = benchmod.build_problem(n_states=n_states, dtype=jnp.float64)
    cpu_ref = load_cpu_reference()
    info = cpu_ref.solve_cpu_sparse(graph, values)
    info["n_states"] = n_states
    print(json.dumps(info))


if __name__ == "__main__":
    main()
