"""Powell's Dogleg trust-region optimizer (reference:
gtsam/nonlinear/DoglegOptimizer, SURVEY.md §2.2 S10).

Fully on-device while_loop like LM. The Gauss-Newton step comes from any
pluggable linear solver (lambda = 0); the Cauchy (steepest-descent) step and
the quadratic-model quantities (g, H v) are computed MATRIX-FREE from the
per-batch linearizations (H v = sum_k J_k^T (J_k v)), so the dogleg logic is
independent of the solver backend.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..graph import graph as graphlib
from ..ops.matfree import gradient as _gradient_mf
from ..ops.matfree import hessian_vec as _hessian_vec_mf
from ..ops.matfree import tree_add as _tree_add
from ..ops.matfree import tree_dot as _tree_dot
from ..ops.matfree import tree_scale as _tree_scale
from .lm import SolveStats, make_dense_solver


@dataclasses.dataclass(frozen=True)
class DoglegConfig:
    """DoglegParams equivalent (GTSAM: deltaInitial=1.0)."""

    max_iterations: int = 100
    delta_init: float = 1.0
    delta_min: float = 1e-8
    delta_max: float = 1e5
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5


def dogleg_solve(graph, values0, config: DoglegConfig = DoglegConfig(),
                 solver=None):
    """Trust-region dogleg. Returns (values, SolveStats); jittable."""
    if solver is None:
        solver = make_dense_solver(False)
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype
    err0 = graphlib.error(graph, values0)
    T = config.max_iterations

    def cond(carry):
        return jnp.logical_and(carry[3] < T, jnp.logical_not(carry[4]))

    def body(carry):
        values, delta_tr, err, it, _done, conv, hist = carry
        lins = graphlib.linearize(graph, values)
        g = _gradient_mf(graph, lins, values)
        d_gn = solver(graph, values, lins, jnp.zeros((), dtype))
        # Cauchy step: -alpha g, alpha = g.g / g.H.g
        Hg = _hessian_vec_mf(graph, lins, g)
        gg = _tree_dot(g, g)
        gHg = _tree_dot(g, Hg)
        alpha = gg / jnp.maximum(gHg, 1e-30)
        d_sd = _tree_scale(g, -alpha)

        n_gn = jnp.sqrt(_tree_dot(d_gn, d_gn))
        n_sd = jnp.sqrt(_tree_dot(d_sd, d_sd))

        # blend: tau solves |d_sd + tau (d_gn - d_sd)| = delta_tr
        diff = _tree_add(d_gn, d_sd, -1.0)
        a = _tree_dot(diff, diff)
        b = 2.0 * _tree_dot(d_sd, diff)
        c = _tree_dot(d_sd, d_sd) - delta_tr * delta_tr
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        tau = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-30)
        tau = jnp.clip(tau, 0.0, 1.0)

        use_gn = n_gn <= delta_tr
        scale_sd = delta_tr / jnp.maximum(n_sd, 1e-30)
        use_scaled_sd = jnp.logical_and(jnp.logical_not(use_gn),
                                        n_sd >= delta_tr)

        def blend(x_gn, x_sd, x_diff):
            return jnp.where(
                use_gn, x_gn,
                jnp.where(use_scaled_sd, scale_sd * x_sd, x_sd + tau * x_diff),
            )

        d = jax.tree_util.tree_map(blend, d_gn, d_sd, diff)

        candidate = graphlib.retract_all(graph, values, d)
        new_err = graphlib.error(graph, candidate)
        # model reduction: -g.d - 0.5 d.H.d
        Hd = _hessian_vec_mf(graph, lins, d)
        pred = -_tree_dot(g, d) - 0.5 * _tree_dot(d, Hd)
        actual = err - new_err
        rho = actual / jnp.maximum(pred, 1e-30)

        accept = jnp.logical_and(actual > 0, jnp.isfinite(new_err))
        values = jax.tree_util.tree_map(
            lambda bnew, bold: jnp.where(
                jnp.reshape(accept, (1,) * bold.ndim), bnew, bold
            ),
            candidate, values,
        )
        err_next = jnp.where(accept, new_err, err)
        nd = jnp.sqrt(_tree_dot(d, d))
        grow = jnp.logical_and(rho > 0.75, nd > 0.8 * delta_tr)
        shrink = rho < 0.25
        delta_next = jnp.where(
            grow, jnp.minimum(2.0 * delta_tr, config.delta_max),
            jnp.where(shrink, jnp.maximum(0.5 * delta_tr, config.delta_min),
                      delta_tr),
        )
        rel_ok = (err - new_err) <= config.relative_error_tol * err
        abs_ok = (err - new_err) <= config.absolute_error_tol
        conv = jnp.logical_and(accept, jnp.logical_or(rel_ok, abs_ok))
        stuck = jnp.logical_and(jnp.logical_not(accept),
                                delta_next <= config.delta_min * 1.001)
        done = jnp.logical_or(conv, stuck)
        hist = (
            hist[0].at[it].set(err_next),
            hist[1].at[it].set(delta_tr),
            hist[2].at[it].set(accept),
        )
        return (values, delta_next, err_next, it + 1, done, conv, hist)

    hist0 = (
        jnp.full((T,), jnp.nan, dtype),
        jnp.full((T,), jnp.nan, dtype),
        jnp.zeros((T,), jnp.bool_),
    )
    carry0 = (
        values0, jnp.asarray(config.delta_init, dtype), err0,
        jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(False),
        hist0,
    )
    values, delta_tr, err, it, _done, conv, hist = jax.lax.while_loop(
        cond, body, carry0
    )
    stats = SolveStats(
        error0=err0, error=err, iterations=it, converged=conv,
        aborted=jnp.logical_not(conv), lambda_final=delta_tr,
        error_history=hist[0], lambda_history=hist[1], accept_history=hist[2],
    )
    return values, stats
