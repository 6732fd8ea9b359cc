"""Full time-sharded LM (P4): trajectory chunks + halo exchange + SPIKE
solve vs the single-device chain backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.parallel import make_mesh
from gpslam_tpu.parallel.time_shard import lm_solve_time_sharded
from gpslam_tpu.solve import lm_solve


def test_time_sharded_lm_matches_single_device():
    data = synthetic.make_linear2d_range_slam(
        n_states=64, ranges_per_interval=0.5, seed=12
    )
    graph, values = linear2d.build(data, dtype=jnp.float32)
    mesh = make_mesh(4, axis_name="time")
    vals_sh, st_sh = lm_solve_time_sharded(
        graph, values, mesh, LMConfig(max_iterations=30)
    )
    solver = chain.make_chain_solver(graph)
    vals_1, st_1 = lm_solve(graph, values, LMConfig(max_iterations=30),
                            solver=solver)
    assert float(st_sh.error) == pytest.approx(float(st_1.error), rel=1e-3)
    np.testing.assert_allclose(
        np.asarray(vals_sh["state"][0]), np.asarray(vals_1["state"][0]),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(vals_sh["landmark"]), np.asarray(vals_1["landmark"]),
        atol=5e-3,
    )


def test_time_sharded_rejects_bad_partition():
    data = synthetic.make_linear2d_range_slam(n_states=30, seed=1)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    mesh = make_mesh(4, axis_name="time")
    with pytest.raises(ValueError, match="not divisible"):
        lm_solve_time_sharded(graph, values, mesh, LMConfig())
