"""Typed factor tables + Values: the TPU-native factor-graph container.

Replaces the reference's `NonlinearFactorGraph` / `Values` object graph
(SURVEY.md §2.2 S4-S5): instead of a vector of factor pointers with virtual
`evaluateError`, the graph is a tuple of homogeneous FACTOR BATCHES — one per
factor *type* — each holding struct-of-arrays params and int32 index arrays
into per-group variable tables. Everything is a pytree, so `error`,
`linearize`, and whole optimizers jit/vmap/shard cleanly.

Conventions (GTSAM-compatible for chi^2 parity):
  - residuals are whitened; total error = 0.5 * sum_k |r_k|^2
  - linearization is w.r.t. local coordinates at the current estimate:
    J = d residual(retract(x, delta)) / d delta  at delta = 0
    (computed per factor with jacfwd, vmapped over the batch — the TPU
    equivalent of the reference's hot loop #1, SURVEY.md §3.1)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .manifolds import Manifold


@struct.dataclass
class FactorBatch:
    """A homogeneous batch of M factors of one type.

    idx[s]    (M,) int32 — row of each factor's slot-s variable in its group
    params    pytree of (M, ...) arrays (measurements, dt/tau, sqrt-info, ...)
    residual  (slot_values..., params_one) -> (rdim,) whitened residual
    groups    slot -> variable-group name
    """

    idx: Tuple[jnp.ndarray, ...]
    params: Any
    name: str = struct.field(pytree_node=False)
    residual: Callable = struct.field(pytree_node=False)
    groups: Tuple[str, ...] = struct.field(pytree_node=False)
    rdim: int = struct.field(pytree_node=False)
    # optional (M,) 0/1 weights: 0 disables a factor (padding for sharding,
    # inactive factors in the sliding window). None means all-active.
    mask: Any = None
    # optional robust m-estimator: (name, k), e.g. ("huber", 1.345).
    # Applied on top of the whitened residual (GTSAM Robust noise model
    # semantics, SURVEY.md §2.2 S3): error uses loss(|r|), linearization
    # scales (r, J) by sqrt(weight(|r|)) (IRLS).
    robust: Any = struct.field(pytree_node=False, default=None)
    # optional hand-derived linearizer: (slot_values..., params) ->
    # (whitened r, tuple of whitened J per slot), replacing the jacfwd
    # default (the reference's analytic evaluateError Jacobians, ~10x
    # cheaper than AD for high-slot-count factors).
    linearizer: Any = struct.field(pytree_node=False, default=None)
    # STATIC per-slot structure hints: tuple with, per slot, either None or
    # the int k0 such that idx[s] == arange(k0, k0+M). When set, value
    # gathers become contiguous slices (TPU row-gathers of short rows run
    # far below HBM roofline; a slice is a straight copy). Computed by
    # GraphBuilder from the concrete index arrays; constructors that build
    # batches with runtime index data leave it None (generic gather).
    idx_arange: Any = struct.field(pytree_node=False, default=None)

    @property
    def size(self) -> int:
        return self.idx[0].shape[0]


@struct.dataclass
class Graph:
    """Factor graph: batches + (static) manifold spec per variable group."""

    batches: Tuple[FactorBatch, ...]
    manifolds: Dict[str, Manifold] = struct.field(pytree_node=False)

    def group_sizes(self, values) -> Dict[str, int]:
        return {g: jax.tree_util.tree_leaves(v)[0].shape[0] for g, v in values.items()}


def gather(group_values, idx):
    """Select rows `idx` from every leaf of a group's value pytree."""
    return jax.tree_util.tree_map(lambda a: a[idx], group_values)


def gather_slot(batch: FactorBatch, values, s: int):
    """Slot-s variable rows; a contiguous SLICE when the batch's static
    structure hints say idx[s] == arange(k0, k0+M) (see FactorBatch)."""
    k0 = batch.idx_arange[s] if batch.idx_arange is not None else None
    if k0 is not None:
        M = batch.idx[s].shape[0]
        return jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(a, k0, k0 + M),
            values[batch.groups[s]],
        )
    return gather(values[batch.groups[s]], batch.idx[s])


def batch_residuals(batch: FactorBatch, values) -> jnp.ndarray:
    """(M, rdim) whitened residuals for one batch (vmapped kernel)."""
    gathered = tuple(
        gather_slot(batch, values, s) for s in range(len(batch.groups))
    )

    def one(slot_vals, params_one):
        return batch.residual(*slot_vals, params_one)

    r = jax.vmap(one)(gathered, batch.params)
    if batch.mask is not None:
        r = r * batch.mask[:, None].astype(r.dtype)
    return r


def error(graph: Graph, values) -> jnp.ndarray:
    """Total graph error 0.5 * sum |r|^2 (GTSAM convention, SURVEY.md §2.3).

    Per-batch sums run through `utils.compensated.compensated_sum` — an
    explicit pairwise tree + Neumaier tail — so the f32 chi^2 stays within
    ~1e-6 of the f64 value even at 10^6-factor scale (SURVEY.md §7
    hard-part 1); the cross-batch accumulation is only #batches terms.
    """
    from ..utils.compensated import compensated_sum

    total = jnp.zeros((), _result_dtype(values))
    for b in graph.batches:
        r = batch_residuals(b, values)
        if b.robust is None:
            total = total + 0.5 * compensated_sum(r * r)
        else:
            from ..factors import robust as robust_mod

            loss_fn, _ = robust_mod.get(b.robust[0])
            e = robust_mod.residual_norm(r)
            losses = loss_fn(e, b.robust[1])
            if b.mask is not None:
                losses = losses * b.mask.astype(losses.dtype)
            total = total + compensated_sum(losses)
    return total


def _result_dtype(values):
    return jax.tree_util.tree_leaves(values)[0].dtype


@struct.dataclass
class LinearizedBatch:
    """Whitened linearization of one batch at the current estimate.

    r   (M, rdim)
    J   tuple over slots of (M, rdim, dim_slot)
    """

    r: jnp.ndarray
    J: Tuple[jnp.ndarray, ...]


def linearize_batch(batch: FactorBatch, manifolds, values) -> LinearizedBatch:
    gathered = tuple(
        gather_slot(batch, values, s) for s in range(len(batch.groups))
    )
    dims = tuple(manifolds[g].dim for g in batch.groups)
    dtype = _result_dtype(values)

    if batch.linearizer is not None:
        def one(slot_vals, params_one):
            return batch.linearizer(*slot_vals, params_one)
    else:
        def one(slot_vals, params_one):
            def at_delta(deltas):
                perturbed = tuple(
                    manifolds[g].retract(v, d)
                    for g, v, d in zip(batch.groups, slot_vals, deltas)
                )
                return batch.residual(*perturbed, params_one)

            zeros = tuple(jnp.zeros((d,), dtype) for d in dims)
            r = at_delta(zeros)
            J = jax.jacfwd(at_delta)(zeros)
            return r, J

    r, J = jax.vmap(one)(gathered, batch.params)
    if batch.robust is not None:
        from ..factors import robust as robust_mod

        _, weight_fn = robust_mod.get(batch.robust[0])
        w = jnp.sqrt(weight_fn(robust_mod.residual_norm(r), batch.robust[1]))
        r = r * w[:, None]
        J = tuple(Ji * w[:, None, None] for Ji in J)
    if batch.mask is not None:
        m = batch.mask.astype(r.dtype)
        r = r * m[:, None]
        J = tuple(Ji * m[:, None, None] for Ji in J)
    return LinearizedBatch(r=r, J=J)


def linearize(graph: Graph, values):
    """All batches (reference: NonlinearFactorGraph::linearize, §3.1)."""
    return tuple(linearize_batch(b, graph.manifolds, values) for b in graph.batches)


def retract_all(graph: Graph, values, delta_by_group):
    """values <- values ⊞ delta, per group (reference: Values::retract)."""
    out = {}
    for g, v in values.items():
        man = graph.manifolds[g]
        out[g] = jax.vmap(man.retract)(v, delta_by_group[g])
    return out
