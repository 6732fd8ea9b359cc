"""Time-axis (trajectory) sharding tests on the 8-device CPU mesh:
distributed SPIKE block-tridiag solve vs single-device BCR."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gpslam_tpu.ops import tridiag
from gpslam_tpu.parallel import make_mesh
from gpslam_tpu.parallel.time_shard import (
    spike_schur_arrowhead_solve,
    spike_solve,
)

RNG = np.random.default_rng(53)


def random_chain(n, b, k):
    D = RNG.normal(size=(n, b, b))
    D = D @ D.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    U = 0.8 * RNG.normal(size=(n, b, b))
    U[-1] = 0
    r = RNG.normal(size=(n, b, k))
    return (jnp.asarray(D, jnp.float64), jnp.asarray(U, jnp.float64),
            jnp.asarray(r, jnp.float64))


# NOTE: each (n_dev, b) variant costs minutes of XLA CPU compile time for
# the partitioned unrolled program (8-device variants did not finish in 10
# minutes); keep ONE variant — the algorithm is size-generic, n_dev/b only
# change static shapes.
@pytest.mark.parametrize("n_dev,b", [(4, 4)])
def test_spike_matches_bcr(n_dev, b):
    n = n_dev * 8
    D, U, r = random_chain(n, b, k=3)
    mesh = make_mesh(n_dev, axis_name="time")

    # NOTE: always jit the shard_map — eager shard_map dispatches each of
    # the hundreds of unrolled ops through the SPMD interpreter (minutes);
    # jitted it compiles in seconds.
    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("time"), P("time"), P("time")),
        out_specs=P("time"),
        check_vma=False,
    )
    def run(Dl, Ul, rl):
        return spike_solve(Dl, Ul, rl, "time")

    x_sh = run(D, U, r)
    x_ref = tridiag.bcr_solve(D, U, r)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), atol=1e-8)


def test_spike_schur_matches_single_device():
    n_dev, b, L, dl = 4, 4, 3, 2
    n = n_dev * 6
    Pdim = L * dl
    D, U, _ = random_chain(n, b, k=1)
    g_s = jnp.asarray(RNG.normal(size=(n, b)))
    H_sl = jnp.asarray(RNG.normal(size=(n, b, Pdim)) * 0.3)
    A = RNG.normal(size=(Pdim, Pdim))
    H_ll = jnp.asarray(A @ A.T + 5.0 * np.eye(Pdim))
    g_l = jnp.asarray(RNG.normal(size=(Pdim,)))
    lam = jnp.asarray(0.05, jnp.float64)

    mesh = make_mesh(n_dev, axis_name="time")

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("time"), P("time"), P("time"), P("time"), P(), P(), P()),
        out_specs=(P("time"), P()),
        check_vma=False,
    )
    def run(Dl, Ul, gl, Hsl, Hll, gll, lam_):
        return spike_schur_arrowhead_solve(Dl, Ul, gl, Hsl, Hll, gll, lam_,
                                           "time")

    ds_sh, dl_sh = run(D, U, g_s, H_sl, H_ll, g_l, lam)
    ds_ref, dl_ref = tridiag.schur_arrowhead_solve(
        D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping=False
    )
    np.testing.assert_allclose(np.asarray(ds_sh), np.asarray(ds_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(dl_sh), np.asarray(dl_ref), atol=1e-8)


def test_spike_under_jit():
    n_dev, b = 4, 4
    n = n_dev * 6
    D, U, r = random_chain(n, b, k=2)
    mesh = make_mesh(n_dev, axis_name="time")

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("time"), P("time"), P("time")),
        out_specs=P("time"),
        check_vma=False,
    )
    def run(Dl, Ul, rl):
        return spike_solve(Dl, Ul, rl, "time")

    x = run(D, U, r)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(tridiag.bcr_solve(D, U, r)), atol=1e-8
    )
