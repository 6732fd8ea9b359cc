"""Fast-tier end-to-end smoke: tiny problems, cheap compiles — keeps the
`pytest -m "not slow"` tier exercising the full solve path (build graph ->
linearize -> assemble -> solve -> retract -> converge) without the
compile-heavy schedule machinery of the slow tier."""

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.solve import lm_solve


def test_tiny_chain_lm_converges():
    data = synthetic.make_linear2d_range_slam(n_states=20, seed=3)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    vals, stats = lm_solve(graph, values, LMConfig(), solver=solver)
    assert bool(stats.converged)
    assert float(stats.error) < float(stats.error0)
    # recovered positions close to ground truth (gauge fixed by the prior)
    err = np.linalg.norm(
        np.asarray(vals["state"][0]) - np.asarray(data["gt_pos"]), axis=-1
    )
    assert np.median(err) < 0.5


def test_tiny_dense_lm_matches_chain():
    data = synthetic.make_linear2d_range_slam(n_states=12, seed=7)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    v1, s1 = lm_solve(graph, values, LMConfig(),
                      solver=chain.make_chain_solver(graph))
    v2, s2 = lm_solve(graph, values, LMConfig())  # dense default
    np.testing.assert_allclose(float(s1.error), float(s2.error), rtol=1e-6)
