"""Pallas RDMA ring primitives vs XLA collectives on the 8-device CPU mesh
(interpret mode simulates the inter-device DMAs — §5.2 sanitizer)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gpslam_tpu.parallel import rdma
from gpslam_tpu.parallel.mesh import make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(N_DEV, axis_name="time")


def test_ring_shift_matches_ppermute(mesh):
    x = jnp.arange(N_DEV * 3 * 4, dtype=jnp.float32).reshape(N_DEV * 3, 4)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("time"),
                       out_specs=(P("time"), P("time")), check_vma=False)
    def run(x_loc):
        got_rdma = rdma.ring_shift(x_loc, "time", shift=1, interpret=True)
        perm = [(i, (i + 1) % N_DEV) for i in range(N_DEV)]
        got_xla = jax.lax.ppermute(x_loc, "time", perm)
        return got_rdma, got_xla

    got_rdma, got_xla = run(x)
    np.testing.assert_array_equal(np.asarray(got_rdma), np.asarray(got_xla))


def test_ring_shift_backward(mesh):
    x = jnp.arange(N_DEV * 2 * 2, dtype=jnp.float32).reshape(N_DEV * 2, 2)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("time"),
                       out_specs=(P("time"), P("time")), check_vma=False)
    def run(x_loc):
        got_rdma = rdma.ring_shift(x_loc, "time", shift=-1, interpret=True,
                                   collective_id=13)
        perm = [(i, (i - 1) % N_DEV) for i in range(N_DEV)]
        got_xla = jax.lax.ppermute(x_loc, "time", perm)
        return got_rdma, got_xla

    got_rdma, got_xla = run(x)
    np.testing.assert_array_equal(np.asarray(got_rdma), np.asarray(got_xla))


def test_ring_all_gather_matches_all_gather(mesh):
    x = jnp.arange(N_DEV * 2 * 3, dtype=jnp.float32).reshape(N_DEV * 2, 3)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("time"),
                       out_specs=(P(), P()), check_vma=False)
    def run(x_loc):
        got_rdma = rdma.ring_all_gather(x_loc, "time", N_DEV, interpret=True,
                                        collective_id=14)
        got_xla = jax.lax.all_gather(x_loc, "time")
        return got_rdma, got_xla

    got_rdma, got_xla = run(x)
    np.testing.assert_array_equal(np.asarray(got_rdma), np.asarray(got_xla))


def test_time_sharded_lm_rdma_matches_xla_collectives(mesh):
    """Full time-sharded LM with every collective on the RDMA ring ==
    the XLA-collective path (same math, different transport)."""
    import jax.numpy as jnp

    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import linear2d
    from gpslam_tpu.parallel.time_shard import lm_solve_time_sharded

    data = synthetic.make_linear2d_range_slam(n_states=8 * N_DEV, seed=0)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    cfg = LMConfig(max_iterations=4)

    vals_x, st_x = lm_solve_time_sharded(graph, values, mesh, cfg)
    vals_r, st_r = lm_solve_time_sharded(graph, values, mesh, cfg,
                                         use_rdma=True, rdma_interpret=True)
    assert float(st_r.error) == pytest.approx(float(st_x.error), rel=1e-6)
    np.testing.assert_allclose(np.asarray(vals_r["state"][0] if isinstance(
        vals_r["state"], tuple) else vals_r["state"]),
        np.asarray(vals_x["state"][0] if isinstance(
            vals_x["state"], tuple) else vals_x["state"]), atol=1e-5)
