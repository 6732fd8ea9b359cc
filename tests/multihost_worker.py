"""One process of an N-process JAX CPU cluster (SURVEY.md §5.8a: the
multi-host story, exercised without TPU hardware via gloo collectives).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Each process owns 4 virtual CPU devices; the sharded solvers run over the
GLOBAL (4*N)-device mesh. Prints `RESULT <path> <final_chi2>` lines that
tests/test_multihost.py compares against the single-process solve.
"""

import os
import re
import sys

flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gpslam_tpu.parallel import (
        init_distributed,
        lm_solve_sharded,
        make_mesh,
    )
    from gpslam_tpu.parallel.time_shard import lm_solve_time_sharded

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import jax.numpy as jnp

    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import linear2d

    data = synthetic.make_linear2d_range_slam(n_states=64, seed=0)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    cfg = LMConfig(max_iterations=8)

    _, st = lm_solve_sharded(graph, values, make_mesh(axis_name="factor"),
                             cfg)
    print(f"RESULT factor {float(st.error):.6f}", flush=True)

    _, st_t = lm_solve_time_sharded(graph, values,
                                    make_mesh(axis_name="time"), cfg)
    print(f"RESULT time {float(st_t.error):.6f}", flush=True)

    # supernode-sharded general sparse path (P2) on a loop-closure SE(2)
    # pose graph — per-level frontal psum rides the same gloo transport
    from gpslam_tpu.models import pose2_slam
    from gpslam_tpu.parallel import lm_solve_supernodal_sharded

    data_lc = synthetic.make_se2_pose_graph(n_states=30, seed=4)
    graph_lc, values_lc = pose2_slam.build(data_lc, dtype=jnp.float32)
    _, st_n = lm_solve_supernodal_sharded(graph_lc, values_lc,
                                          make_mesh(axis_name="node"), cfg)
    print(f"RESULT supernode {float(st_n.error):.6f}", flush=True)


if __name__ == "__main__":
    main()
