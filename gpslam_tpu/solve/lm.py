"""On-device Gauss-Newton / Levenberg-Marquardt (SURVEY.md §2.2 S10).

The entire damping loop — linearize, assemble, factorize, solve, retract,
accept/reject, lambda adaptation — runs inside one `lax.while_loop` under
jit, per BASELINE.json's "LM damping loop fully on-device". No host
round-trips; per-iteration diagnostics are written into fixed-size on-device
history arrays (the §5.5 structured-record equivalent of GTSAM's verbose
prints) and returned with the solution.

Architecture: `_lm_loop` is the pure damping loop over three callables
(error_fn, step_fn, retract_fn). The single-device `lm_solve` wires it to the
graph library; the sharded variant (parallel/solve.py) wires it to
psum-reduced versions INSIDE a shard_map region; the vmapped multi-hypothesis
variant maps it over a batch axis (BASELINE "vmapped chain dimension").

The linear solver is pluggable: `solver(graph, values, lins, lam) ->
delta_by_group`. Backends: ops/dense.py (small problems), ops/chain.py
(BCR + landmark Schur — the Plaza fast path), later the Pallas supernodal
Cholesky. LM semantics follow GTSAM's LevenbergMarquardtOptimizer::iterate:
accept iff error decreases; lambda /= factor on accept, *= factor on reject;
stop on convergence, maxIterations, or lambda overflow.
"""

from __future__ import annotations

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
    converged: jnp.ndarray  # stopped because the error change was < tol
    aborted: jnp.ndarray  # stopped because lambda overflowed (no progress)
    lambda_final: jnp.ndarray
    error_history: jnp.ndarray
    lambda_history: jnp.ndarray
    accept_history: jnp.ndarray


def _select(pred, new, old):
    return jax.tree_util.tree_map(
        lambda b, a: jnp.where(jnp.reshape(pred, (1,) * a.ndim), b, a), new, old
    )


def _lm_loop(values0, error_fn: Callable, step_fn: Callable,
             retract_fn: Callable, config: LMConfig, dtype):
    """Core damped loop; all three callables close over the graph."""
    err0 = error_fn(values0)
    T = config.max_iterations

    def cond(carry):
        return jnp.logical_and(carry[3] < T, jnp.logical_not(carry[4]))

    def body(carry):
        values, lam, err, it, done0, conv0, abort0, hist = carry
        delta = step_fn(values, lam)
        candidate = retract_fn(values, delta)
        new_err = error_fn(candidate)
        accept = jnp.logical_and(new_err < err, jnp.isfinite(new_err))

        values_n = _select(accept, candidate, values)
        err_next = jnp.where(accept, new_err, err)
        lam_next = jnp.where(
            accept,
            jnp.maximum(lam / config.lambda_factor, config.lambda_min),
            lam * config.lambda_factor,
        )
        rel_ok = (err - new_err) <= config.relative_error_tol * err
        abs_ok = (err - new_err) <= config.absolute_error_tol
        conv = jnp.logical_and(accept, jnp.logical_or(rel_ok, abs_ok))
        # a REJECTED step whose cost is within rel_tol of the incumbent is a
        # stationary point at working precision: without this, an f32 solve
        # that has fully converged burns ~12 extra reject iterations walking
        # lambda to overflow (measured: 15 vs 3 iterations at 20k states,
        # same final chi^2 as the f64 reference either way)
        conv = jnp.logical_or(
            conv,
            jnp.logical_and(
                jnp.logical_not(accept),
                new_err - err < config.relative_error_tol * err,
            ),
        )
        abort = jnp.logical_and(
            jnp.logical_not(accept), lam_next > config.lambda_max
        )
        done = jnp.logical_or(conv, abort)

        hist_n = (
            hist[0].at[it].set(err_next),
            hist[1].at[it].set(lam),
            hist[2].at[it].set(accept),
        )
        # freeze lanes that already finished: under vmap the while_loop
        # keeps stepping until EVERY lane is done, and without this mask an
        # early-converged hypothesis would keep mutating — vmapped multiseed
        # must reproduce S independent solves bit-for-bit. Scalar semantics
        # are unchanged (cond() guarantees done0 is False here).
        live = jnp.logical_not(done0)
        return (
            _select(live, values_n, values),
            jnp.where(live, lam_next, lam),
            jnp.where(live, err_next, err),
            jnp.where(live, it + 1, it),
            jnp.where(live, done, done0),
            jnp.where(live, conv, conv0),
            jnp.where(live, abort, abort0),
            _select(live, hist_n, hist),
        )

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
        jnp.asarray(False),
        jnp.asarray(False),
        hist0,
    )
    values, lam, err, it, _done, conv, abort, hist = jax.lax.while_loop(
        cond, body, carry0
    )
    stats = SolveStats(
        error0=err0, error=err, iterations=it, converged=conv, aborted=abort,
        lambda_final=lam, error_history=hist[0], lambda_history=hist[1],
        accept_history=hist[2],
    )
    return values, stats


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

    def error_fn(values):
        return graphlib.error(graph, values)

    def step_fn(values, lam):
        lins = graphlib.linearize(graph, values)
        return solver(graph, values, lins, lam)

    def retract_fn(values, delta):
        return graphlib.retract_all(graph, values, delta)

    return _lm_loop(values0, error_fn, step_fn, retract_fn, config, dtype)


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
        values = _select(improved, candidate, values)
        err_next = jnp.where(improved, new_err, err)
        rel_ok = (err - new_err) <= config.relative_error_tol * err
        abs_ok = (err - new_err) <= config.absolute_error_tol
        done = jnp.logical_or(jnp.logical_not(improved), jnp.logical_or(rel_ok, abs_ok))
        return (values, err_next, it + 1, done)

    values, err, it, done = jax.lax.while_loop(
        cond, body, (values0, err0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    stats = SolveStats(
        error0=err0, error=err, iterations=it, converged=done,
        aborted=jnp.asarray(False), lambda_final=jnp.zeros((), dtype),
        error_history=jnp.full((T,), jnp.nan, dtype),
        lambda_history=jnp.full((T,), jnp.nan, dtype),
        accept_history=jnp.zeros((T,), jnp.bool_),
    )
    return values, stats
