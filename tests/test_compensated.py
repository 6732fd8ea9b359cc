"""Compensated f32 accumulation (SURVEY.md §7 hard-part 1): chi^2 and inner
products must track f64 even at 10^5-10^6-term scale. The reference runs
all-f64 (GTSAM/Eigen), so matching its behavior on TPU f32 hinges on these
reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.utils.compensated import compensated_dot, compensated_sum


def test_compensated_sum_tracks_f64():
    # chi^2-shaped input: 10^6 positive terms spanning 4 orders of
    # magnitude — the realistic case; bound is relative to the sum itself
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=1_000_000) ** 4 * 1e3
    exact = x.sum(dtype=np.float64)
    got = float(compensated_sum(jnp.asarray(x, jnp.float32)))
    assert abs(got - exact) / exact < 2e-6, (got, exact)


def test_compensated_sum_cancellation_bound():
    # adversarial cancellation: +-1e7 head/tail bracketing 10^6 small terms.
    # Guarantee is O(log n * eps) relative to sum|x| (within-chunk absorption
    # against the 1e7 head is unavoidable without full error-free transforms)
    rng = np.random.default_rng(0)
    tail = rng.uniform(0.1, 1.0, size=1_000_000)
    x = np.concatenate([[1e7], tail, [-1e7]])
    exact = tail.sum(dtype=np.float64)
    got = float(compensated_sum(jnp.asarray(x, jnp.float32)))
    assert abs(got - exact) < 1e-5 * np.abs(x).sum(), (got, exact)
    # and still 4+ digits of the condensed result despite the 1e7 bracket
    assert abs(got - exact) / exact < 1e-4, (got, exact)


def test_compensated_sum_matches_plain_for_small():
    x = jnp.arange(17.0, dtype=jnp.float32)
    assert float(compensated_sum(x)) == float(jnp.sum(x))


def test_compensated_dot_jit_grad():
    a = jnp.asarray(np.random.default_rng(1).normal(size=3000), jnp.float32)
    b = jnp.asarray(np.random.default_rng(2).normal(size=3000), jnp.float32)
    f = jax.jit(compensated_dot)
    expect = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    assert abs(float(f(a, b)) - expect) < 1e-3
    # differentiable (lax.scan path): d<a,b>/da = b
    g = jax.grad(lambda u: compensated_dot(u, b))(a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_chi2_f32_vs_f64_at_100k_states():
    """f32 final chi^2 within 1% of f64 on a 100k-state Plaza-style problem
    (VERDICT r1 item 6; target scale of BASELINE.json config 5)."""
    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import linear2d
    from gpslam_tpu.ops import chain
    from gpslam_tpu.solve import lm_solve

    data = synthetic.make_linear2d_range_slam(
        n_states=100_000, ranges_per_interval=0.36, seed=5, init_noise=0.5
    )
    cfg = LMConfig(max_iterations=25)

    finals = {}
    for dtype in (jnp.float32, jnp.float64):
        graph, values = linear2d.build(data, dtype=dtype)
        solver = chain.make_chain_solver(graph)
        vals, stats = lm_solve(graph, values, cfg, solver=solver)
        # score both solutions on the f64 graph for a common yardstick
        graph64, _ = linear2d.build(data, dtype=jnp.float64)
        vals64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), vals
        )
        finals[dtype.__name__] = float(graphlib.error(graph64, vals64))

    f32, f64 = finals["float32"], finals["float64"]
    assert abs(f32 - f64) / f64 < 0.01, finals
