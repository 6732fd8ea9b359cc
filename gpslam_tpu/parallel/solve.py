"""SPMD factor-sharded LM (SURVEY.md §2.4 P1): factors sharded over the mesh,
psum collectives for gradient/Hessian assembly, replicated structured solve.

This is the BASELINE.json "sharding factor blocks ... psum/all-gather
collectives for gradient assembly" deliverable. The graph's factor tables
(idx/params/mask arrays) are sharded along the factor axis with shard_map;
values are replicated. Each device linearizes its factor shard (the expensive
jacfwd work — perfectly parallel), scatter-assembles LOCAL partial
block-tridiag + arrowhead structures, and one psum per structure produces the
replicated normal equations; the BCR+Schur solve then runs replicated on all
devices (trajectory-sharded solves — P4 — are the next level and live in
parallel/time_shard.py when built).

The whole LM while_loop runs INSIDE the shard_map region, so per-iteration
communication is exactly: one psum of the assembled blocks + one psum scalar
for the candidate error. No host round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LMConfig
from ..graph import graph as graphlib
from ..graph.graph import FactorBatch, Graph
from ..ops import chain as chain_ops
from ..ops import tridiag
from . import mesh as make_mesh_mod
from .mesh import make_mesh


def pad_graph(graph: Graph, multiple: int) -> Graph:
    """Pad every batch to a size divisible by `multiple` with masked-out
    duplicates of the last factor (structure-preserving: chain invariants
    like idx_j = idx_i + 1 keep holding on the padding)."""
    batches = []
    for b in graph.batches:
        m = b.size
        m_pad = ((m + multiple - 1) // multiple) * multiple
        pad = m_pad - m
        if pad == 0:
            mask = b.mask if b.mask is not None else jnp.ones((m,), jnp.float32)
            # idx_arange hints are only valid for the GLOBAL index arrays;
            # these batches are about to be factor-sharded (local slices per
            # device), so the static-slice fast path must be disabled.
            batches.append(b.replace(mask=mask, idx_arange=None))
            continue
        idx = tuple(
            jnp.concatenate([ix, jnp.repeat(ix[-1:], pad, 0)]) for ix in b.idx
        )
        params = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)]), b.params
        )
        mask0 = b.mask if b.mask is not None else jnp.ones((m,), jnp.float32)
        mask = jnp.concatenate([mask0, jnp.zeros((pad,), mask0.dtype)])
        batches.append(
            FactorBatch(idx=idx, params=params, name=b.name, residual=b.residual,
                        groups=b.groups, rdim=b.rdim, mask=mask)
        )
    return Graph(batches=tuple(batches), manifolds=graph.manifolds)


def lm_solve_sharded(
    graph: Graph,
    values0,
    mesh: Optional[Mesh] = None,
    config: LMConfig = LMConfig(),
    state_group: str = "state",
    lm_group: Optional[str] = "landmark",
    axis_name: str = "factor",
):
    """Factor-sharded LM over the mesh. Returns (values, SolveStats).

    Call once per graph (pads + builds role tables host-side), then the
    returned jitted computation can be reused by re-calling (jit caches on
    the padded shapes).
    """
    from ..solve.lm import _lm_loop  # local import to avoid cycle

    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    gp = pad_graph(graph, n_dev)
    if lm_group is not None and lm_group not in gp.manifolds:
        lm_group = None
    roles = chain_ops.build_role_table(gp, state_group, lm_group)
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype
    diagonal_damping = config.diagonal_damping

    graph_specs = jax.tree_util.tree_map(lambda _: P(axis_name), gp)
    values_specs = jax.tree_util.tree_map(lambda _: P(), values0)
    gp = make_mesh_mod.global_put(gp, mesh, graph_specs)
    values0 = make_mesh_mod.global_put(values0, mesh, values_specs)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_specs, values_specs),
        out_specs=jax.tree_util.tree_map(lambda _: P(), (values0, _stats_struct(config, dtype))),
        check_vma=False,
    )
    def run(graph_local: Graph, values_rep):
        def error_fn(values):
            total = jnp.zeros((), dtype)
            for b in graph_local.batches:
                r = graphlib.batch_residuals(b, values)
                total = total + 0.5 * jnp.sum(r * r)
            return jax.lax.psum(total, axis_name)

        def step_fn(values, lam):
            lins = graphlib.linearize(graph_local, values)
            D, U, g_s, H_sl, H_ll, g_l = chain_ops.assemble_chain(
                graph_local, lins, values, roles, state_group, lm_group
            )
            # ONE collective round: psum the partial normal equations
            if lm_group is None:
                D, U, g_s = jax.lax.psum((D, U, g_s), axis_name)
                b = D.shape[-1]
                if diagonal_damping:
                    dd = jnp.maximum(jnp.diagonal(D, axis1=-2, axis2=-1), 1e-10)
                    D_damped = D + lam * jax.vmap(jnp.diag)(dd)
                else:
                    D_damped = D + lam * jnp.eye(b, dtype=dtype)
                ds = -tridiag.bcr_solve(D_damped, U, g_s[..., None])[..., 0]
                return {state_group: ds}
            D, U, g_s, H_sl, H_ll, g_l = jax.lax.psum(
                (D, U, g_s, H_sl, H_ll, g_l), axis_name
            )
            ds, dl = tridiag.schur_arrowhead_solve(
                D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping
            )
            return {
                state_group: ds,
                lm_group: dl.reshape(-1, gp.manifolds[lm_group].dim),
            }

        def retract_fn(values, delta):
            return graphlib.retract_all(graph_local, values, delta)

        return _lm_loop(values_rep, error_fn, step_fn, retract_fn, config, dtype)

    return jax.jit(run)(gp, values0)


def _stats_struct(config, dtype):
    """Shape-only SolveStats pytree used to build out_specs."""
    from ..solve.lm import SolveStats

    T = config.max_iterations
    z = jnp.zeros(())
    return SolveStats(
        error0=z, error=z, iterations=z, converged=z, aborted=z,
        lambda_final=z,
        error_history=jnp.zeros((T,)),
        lambda_history=jnp.zeros((T,)),
        accept_history=jnp.zeros((T,)),
    )


def lm_solve_multiseed(graph, values_batched, config: LMConfig = LMConfig(),
                       solver=None):
    """Vmapped many-hypothesis solve (SURVEY.md §2.4 P6, BASELINE "vmapped
    chain dimension"): values_batched leaves have a leading seed axis; each
    seed runs the full LM loop (lanes mask off as they converge)."""
    from ..solve.lm import lm_solve

    return jax.vmap(lambda v: lm_solve(graph, v, config, solver=solver))(
        values_batched
    )
