"""On-device Gauss-Newton / Levenberg-Marquardt (SURVEY.md §2.2 S10).

The entire damping loop — linearize, assemble, factorize, solve, retract,
accept/reject, lambda adaptation — runs inside one `lax.while_loop` under
jit, per BASELINE.json's "LM damping loop fully on-device". No host
round-trips; per-iteration diagnostics are written into fixed-size on-device
history arrays (the §5.5 structured-record equivalent of GTSAM's verbose
prints) and returned with the solution.

The linear solver is pluggable: `solver(graph, values, lins, lam) ->
delta_by_group`. Backends: ops/dense.py (small problems), ops/tridiag.py
(chain + landmark Schur — the Plaza fast path), later the Pallas supernodal
Cholesky. LM semantics follow GTSAM's LevenbergMarquardtOptimizer::iterate:
accept iff error decreases; lambda /= factor on accept, *= factor on reject;
stop on convergence, maxIterations, or lambda overflow.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from ..config import GNConfig, LMConfig
from ..graph import graph as graphlib
from ..ops import dense as dense_ops


@struct.dataclass
class SolveStats:
    """Per-solve diagnostics; history arrays have length max_iterations."""

    error0: jnp.ndarray
    error: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    lambda_final: jnp.ndarray
    error_history: jnp.ndarray
    lambda_history: jnp.ndarray
    accept_history: jnp.ndarray


def make_dense_solver(diagonal_damping: bool = False) -> Callable:
    """Dense-Cholesky backend over the full tangent space."""

    def solver(graph, values, lins, lam):
        layout, D = dense_ops.tangent_layout(graph, values)
        dtype = jax.tree_util.tree_leaves(values)[0].dtype
        H, g = dense_ops.assemble_dense(graph, lins, layout, D, dtype)
        delta = dense_ops.solve_dense(H, g, lam, diagonal_damping)
        return dense_ops.split_delta(delta, graph, values, layout)

    return solver


def lm_solve(graph, values0, config: LMConfig = LMConfig(), solver=None):
    """Batch LM. Returns (values, SolveStats). Fully jittable."""
    if solver is None:
        solver = make_dense_solver(config.diagonal_damping)
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype
    err0 = graphlib.error(graph, values0)
    T = config.max_iterations

    def cond(carry):
        _, lam, err, it, done = carry[0], carry[1], carry[2], carry[3], carry[4]
        return jnp.logical_and(it < T, jnp.logical_not(done))

    def body(carry):
        values, lam, err, it, done, hist = carry
        lins = graphlib.linearize(graph, values)
        delta = solver(graph, values, lins, lam)
        candidate = graphlib.retract_all(graph, values, delta)
        new_err = graphlib.error(graph, candidate)
        accept = jnp.logical_and(new_err < err, jnp.isfinite(new_err))

        values = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), b, a
            ),
            values,
            candidate,
        )
        err_next = jnp.where(accept, new_err, err)
        lam_next = jnp.where(
            accept,
            jnp.maximum(lam / config.lambda_factor, config.lambda_min),
            lam * config.lambda_factor,
        )
        rel_ok = (err - new_err) <= config.relative_error_tol * err
        abs_ok = (err - new_err) <= config.absolute_error_tol
        converged = jnp.logical_and(accept, jnp.logical_or(rel_ok, abs_ok))
        lam_overflow = jnp.logical_and(
            jnp.logical_not(accept), lam_next > config.lambda_max
        )
        done = jnp.logical_or(converged, lam_overflow)

        hist = (
            hist[0].at[it].set(err_next),
            hist[1].at[it].set(lam),
            hist[2].at[it].set(accept),
        )
        return (values, lam_next, err_next, it + 1, done, hist)

    hist0 = (
        jnp.full((T,), jnp.nan, dtype),
        jnp.full((T,), jnp.nan, dtype),
        jnp.zeros((T,), jnp.bool_),
    )
    carry0 = (
        values0,
        jnp.asarray(config.lambda_init, dtype),
        err0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        hist0,
    )
    values, lam, err, it, done, hist = jax.lax.while_loop(cond, body, carry0)
    stats = SolveStats(
        error0=err0,
        error=err,
        iterations=it,
        converged=done,
        lambda_final=lam,
        error_history=hist[0],
        lambda_history=hist[1],
        accept_history=hist[2],
    )
    return values, stats


def gn_solve(graph, values0, config: GNConfig = GNConfig(), solver=None):
    """Undamped Gauss-Newton with error-decrease stopping. Jittable."""
    if solver is None:
        solver = make_dense_solver(False)
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype
    err0 = graphlib.error(graph, values0)
    T = config.max_iterations

    def cond(carry):
        return jnp.logical_and(carry[2] < T, jnp.logical_not(carry[3]))

    def body(carry):
        values, err, it, done = carry
        lins = graphlib.linearize(graph, values)
        delta = solver(graph, values, lins, jnp.zeros((), dtype))
        candidate = graphlib.retract_all(graph, values, delta)
        new_err = graphlib.error(graph, candidate)
        improved = jnp.logical_and(new_err < err, jnp.isfinite(new_err))
        values = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(improved, (1,) * a.ndim), b, a),
            values,
            candidate,
        )
        err_next = jnp.where(improved, new_err, err)
        rel_ok = (err - new_err) <= config.relative_error_tol * err
        abs_ok = (err - new_err) <= config.absolute_error_tol
        done = jnp.logical_or(jnp.logical_not(improved), jnp.logical_or(rel_ok, abs_ok))
        return (values, err_next, it + 1, done)

    values, err, it, done = jax.lax.while_loop(
        cond, body, (values0, err0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    stats = SolveStats(
        error0=err0,
        error=err,
        iterations=it,
        converged=done,
        lambda_final=jnp.zeros((), dtype),
        error_history=jnp.full((T,), jnp.nan, dtype),
        lambda_history=jnp.full((T,), jnp.nan, dtype),
        accept_history=jnp.zeros((T,), jnp.bool_),
    )
    return values, stats
