"""Checkpoint/resume, diagnostics, derivative-check utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu import checkpoint
from gpslam_tpu.config import LMConfig
from gpslam_tpu.graph import manifolds
from gpslam_tpu.factors import gp_priors, measurements
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.solve import lm_solve
from gpslam_tpu.utils import checks, diagnostics


def test_checkpoint_roundtrip(tmp_path):
    data = synthetic.make_linear2d_range_slam(n_states=15, seed=2)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, values)
    template = {
        "state": (jnp.zeros_like(values["state"][0]),
                  jnp.zeros_like(values["state"][1])),
        "landmark": jnp.zeros_like(values["landmark"]),
    }
    restored = checkpoint.load(p, template)
    np.testing.assert_array_equal(restored["state"][0], values["state"][0])
    np.testing.assert_array_equal(restored["landmark"], values["landmark"])


def test_checkpoint_resume_determinism(tmp_path):
    """Solve, checkpoint, restore, continue: identical to straight-through
    (§5.3 deterministic-resume requirement)."""
    data = synthetic.make_linear2d_range_slam(n_states=20, seed=7)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    vals_a, _ = lm_solve(graph, values, LMConfig(max_iterations=5))
    p = str(tmp_path / "mid.npz")
    checkpoint.save(p, vals_a)
    vals_b = checkpoint.load(p, vals_a)
    out_direct, _ = lm_solve(graph, vals_a, LMConfig(max_iterations=5))
    out_resumed, _ = lm_solve(graph, vals_b, LMConfig(max_iterations=5))
    np.testing.assert_array_equal(
        np.asarray(out_direct["state"][0]), np.asarray(out_resumed["state"][0])
    )


def test_checkpoint_shape_mismatch_raises(tmp_path):
    p = str(tmp_path / "c.npz")
    checkpoint.save(p, {"a": jnp.zeros((3,))})
    with pytest.raises(ValueError, match="shape"):
        checkpoint.load(p, {"a": jnp.zeros((4,))})


def test_diagnostics_per_batch_errors():
    data = synthetic.make_linear2d_range_slam(n_states=15, seed=2)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    errs = diagnostics.per_batch_errors(graph, values)
    assert set(errs) == {b.name for b in graph.batches}
    from gpslam_tpu.graph import graph as graphlib

    total = sum(e.sum() for e in errs.values())
    assert total == pytest.approx(float(graphlib.error(graph, values)), rel=1e-9)
    report = diagnostics.print_errors(graph, values)
    assert "gp_prior" in report


def test_cholesky_status_flags_indefinite():
    good = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    bad = good.at[2].set(-jnp.eye(3))
    ok = diagnostics.cholesky_status(bad)
    assert bool(ok[0]) and bool(ok[1]) and bool(ok[3])
    assert not bool(ok[2])


def test_check_factor_jacobians_utility():
    man = manifolds.se2_state()
    state_i = (jnp.array([0.1, 0.2, 0.3]), jnp.array([1.0, 0.0, 0.1]))
    state_j = (jnp.array([0.6, 0.25, 0.35]), jnp.array([1.0, 0.0, 0.1]))
    params = {"dt": jnp.asarray(0.5), "qc_sqrt_info": jnp.eye(3)}
    checks.check_factor_jacobians(
        gp_priors.gp_prior_se2, (man, man), (state_i, state_j), params
    )
    # and a measurement factor
    lm_man = manifolds.Vector(2)
    params_r = {"z": jnp.asarray(2.0), "inv_sigma": jnp.asarray(1.0)}
    checks.check_factor_jacobians(
        measurements.range_se2, (man, lm_man),
        (state_i, jnp.array([2.0, 1.0])), params_r,
    )
