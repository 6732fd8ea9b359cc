"""Guards added in round 4 (ADVICE r3 + VERDICT r3 item 8):

- ChainPlan binding: a jitted chain solver bakes slice/gather tables for the
  build-time index arrays; feeding a same-shape graph with different idx
  must raise, not silently assemble a wrong Hessian.
- One-hot landmark budget: batches whose densified landmark intermediates
  exceed the byte budget fall back to scatter assembly WITH a visible
  warning, and the two paths agree numerically (covers the lowered dl^2-
  matmul H_ll form on the one-hot side).
- GraphBuilder rejects traced idx arrays with a clear error.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.graph import GraphBuilder, graph as graphlib, manifolds
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain


def _problem(n=40, seed=0):
    data = synthetic.make_linear2d_range_slam(
        n_states=n, ranges_per_interval=0.8, seed=seed
    )
    graph, values = linear2d.build(data, dtype=jnp.float64)
    return graph, values


def _with_shifted_range_idx(graph):
    """Same shapes, different values: move one interp_range factor to a
    different (still adjacent) state interval."""
    batches = []
    for b in graph.batches:
        if b.name == "interp_range":
            i = np.asarray(b.idx[0]).copy()
            j = np.asarray(b.idx[1]).copy()
            i[0] = (i[0] + 5) % (int(i.max()))
            j[0] = i[0] + 1
            b = b.replace(idx=(i, j) + tuple(b.idx[2:]))
        batches.append(b)
    return graph.replace(batches=tuple(batches))


def test_plan_binding_rejects_different_idx():
    graph, values = _problem()
    plan = chain.build_chain_plan(graph, "state", "landmark")
    lins = graphlib.linearize(graph, values)
    # same graph: fine
    chain.assemble_chain(graph, lins, values, plan, "state", "landmark")
    graph2 = _with_shifted_range_idx(graph)
    lins2 = graphlib.linearize(graph2, values)
    with pytest.raises(ValueError, match="chain plan mismatch"):
        chain.assemble_chain(graph2, lins2, values, plan, "state", "landmark")


def test_plan_binding_skips_traced_idx():
    """Runtime-traced idx arrays cannot be digest-checked — the guard must
    not crash on them (sharded/windowed callers)."""
    graph, values = _problem()
    plan = chain.build_chain_plan(graph, "state", "landmark")

    @jax.jit
    def assemble(graph, values):
        lins = graphlib.linearize(graph, values)
        out = chain.assemble_chain(graph, lins, values, plan, "state",
                                   "landmark")
        return out[0]
    assemble(graph, values)  # idx leaves are traced inside jit


def _assemble(graph, values, roles):
    lins = graphlib.linearize(graph, values)
    return chain.assemble_chain(graph, lins, values, roles, "state",
                                "landmark")


def test_onehot_budget_fallback_warns_and_matches(monkeypatch):
    graph, values = _problem(n=60, seed=2)
    plan = chain.build_chain_plan(graph, "state", "landmark")

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # one-hot side must NOT warn
        ref = _assemble(graph, values, plan)

    monkeypatch.setattr(chain, "_ONEHOT_BYTES_MAX", 64)
    with pytest.warns(UserWarning, match="one-hot landmark budget"):
        out = _assemble(graph, values, plan)

    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_onehot_matches_plain_role_tables():
    """One-hot (plan) vs scatter (role tables) parity — pins the lowered
    H_ll matmul form against the reference scatter path."""
    graph, values = _problem(n=50, seed=3)
    plan = chain.build_chain_plan(graph, "state", "landmark")
    roles = chain.build_role_table(graph, "state", "landmark")
    a = _assemble(graph, values, plan)
    b = _assemble(graph, values, roles)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-9, atol=1e-9)


def test_builder_rejects_traced_idx():
    def build(ix):
        b = GraphBuilder()
        b.add_group("state", manifolds.Vector(2))
        b.add_factors(
            "prior", lambda x, p: x - p["mu"], ("state",), (ix,),
            {"mu": jnp.zeros((3, 2))}, rdim=2,
        )
        return 0.0

    with pytest.raises(TypeError, match="concrete host"):
        jax.jit(build)(jnp.arange(3))
