"""Analytic-vs-AD linearization parity (reference pattern: analytic
evaluateError Jacobians checked against numericalDerivative, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.graph import graph as graphlib
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d


@pytest.fixture(scope="module")
def problem():
    data = synthetic.make_linear2d_range_slam(n_states=25, seed=6)
    return linear2d.build(data, dtype=jnp.float64)


def test_analytic_matches_ad(problem):
    graph, values = problem
    lins_analytic = graphlib.linearize(graph, values)
    # strip the linearizers -> AD path
    graph_ad = graph.replace(
        batches=tuple(b.replace(linearizer=None) for b in graph.batches)
    )
    lins_ad = graphlib.linearize(graph_ad, values)
    for b, la, lad in zip(graph.batches, lins_analytic, lins_ad):
        np.testing.assert_allclose(
            np.asarray(la.r), np.asarray(lad.r), atol=1e-10, err_msg=b.name
        )
        for s, (Ja, Jd) in enumerate(zip(la.J, lad.J)):
            np.testing.assert_allclose(
                np.asarray(Ja), np.asarray(Jd), atol=1e-9,
                err_msg=f"{b.name} slot {s}",
            )


def test_full_solve_identical(problem):
    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.ops import chain
    from gpslam_tpu.solve import lm_solve

    graph, values = problem
    graph_ad = graph.replace(
        batches=tuple(b.replace(linearizer=None) for b in graph.batches)
    )
    s1 = chain.make_chain_solver(graph)
    s2 = chain.make_chain_solver(graph_ad)
    _, st1 = lm_solve(graph, values, LMConfig(), solver=s1)
    _, st2 = lm_solve(graph_ad, values, LMConfig(), solver=s2)
    assert float(st1.error) == pytest.approx(float(st2.error), rel=1e-10)
