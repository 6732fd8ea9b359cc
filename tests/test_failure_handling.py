"""Failure detection / recovery (SURVEY.md §5.3): the reference throws
IndeterminantLinearSystemException on rank-deficient systems; here the
solver must (a) flag non-PD blocks, (b) never emit NaN values from LM —
non-finite candidates are rejected on-device and the solve aborts cleanly."""

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import GraphBuilder, manifolds
from gpslam_tpu.factors import gp_priors, measurements
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.solve import lm_solve, make_dense_solver


def gauge_free_graph(n=10, dtype=jnp.float64):
    """GP chain with NO anchor prior: global translation is unobservable,
    H is singular."""
    b = GraphBuilder()
    b.add_group("state", manifolds.linear_state(2))
    qs = np.eye(2)
    b.add_factors(
        "gp_prior", gp_priors.gp_prior_linear, ("state", "state"),
        (np.arange(n - 1), np.arange(1, n)),
        {"dt": jnp.full((n - 1,), 1.0, dtype),
         "qc_sqrt_info": jnp.asarray(np.broadcast_to(qs, (n - 1, 2, 2)), dtype)},
        rdim=4,
    )
    rng = np.random.default_rng(0)
    values = {"state": (jnp.asarray(rng.normal(size=(n, 2)), dtype),
                        jnp.asarray(rng.normal(size=(n, 2)), dtype))}
    return b.build(), values


def test_singular_system_aborts_cleanly_no_nan():
    graph, values = gauge_free_graph()
    vals, stats = lm_solve(graph, values, LMConfig(max_iterations=30),
                           solver=make_dense_solver(False))
    # every returned value must be finite — rejected NaN steps never leak
    for leaf in [vals["state"][0], vals["state"][1]]:
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert np.isfinite(float(stats.error))
    # with lambda damping the singular directions are regularized, so the
    # solve still reduces the error (Levenberg's original point)
    assert float(stats.error) <= float(stats.error0)


def test_cholesky_status_localizes_indefiniteness():
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.ops import chain as chain_ops
    from gpslam_tpu.utils import diagnostics

    data = synthetic.make_linear2d_range_slam(n_states=12, seed=2)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    roles = chain_ops.build_role_table(graph, "state", "landmark")
    lins = graphlib.linearize(graph, values)
    D, U, *_ = chain_ops.assemble_chain(graph, lins, values, roles, "state",
                                        "landmark")
    ok = diagnostics.cholesky_status(D)
    assert bool(jnp.all(ok))
    # corrupt one block -> exactly that block is flagged
    D_bad = D.at[5].set(-jnp.eye(4, dtype=D.dtype))
    ok2 = diagnostics.cholesky_status(D_bad)
    assert not bool(ok2[5])
    assert int(jnp.sum(~ok2)) == 1
