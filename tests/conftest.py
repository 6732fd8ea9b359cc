"""Test-suite config: enable f64 so reference computations can run in double.

Library code stays dtype-polymorphic (f32 arrays in, f32 out — python scalars
are weak-typed); tests pass explicit float32 inputs when exercising the
TPU-realistic precision path.
"""

import os

import jax
import pytest

jax.config.update("jax_enable_x64", True)

# Compile-heavy files (unrolled level schedules, smoothers, subprocess
# clusters). The FAST tier — `pytest -m "not slow"` — stays under ~5 min on
# this host so it can run per-commit; the full suite remains the default.
_SLOW_FILES = {
    "test_marginals.py", "test_query.py", "test_supernodal.py",
    "test_amalgamated.py", "test_supernodal_shard.py", "test_smoother.py",
    "test_smoother_se2.py", "test_smoother_se3.py", "test_multihost.py",
    "test_time_shard.py", "test_time_shard_lm.py", "test_parallel.py",
    "test_pallas_chol.py", "test_rdma.py", "test_robust_dogleg_pcg.py",
    "test_pallas_supernodal.py",
    "test_solve_e2e.py", "test_pose3.py", "test_landmark_slam.py",
    "test_dense_tail.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
