"""Matrix-free normal-equation operators over linearized factor batches.

The Hessian is never materialized: H v = sum_k J_k^T (J_k v) with gathers at
the factor index arrays — the TPU equivalent of iterating JacobianFactors
(SURVEY.md §2.2 S6). Used by the Dogleg optimizer and the PCG backend (the
scalable path for graphs that fit neither the chain structure nor a dense
Hessian — loop-closure pose graphs at scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_dot(a, b):
    """<a, b> over pytrees; compensated per-leaf accumulation so PCG/dogleg
    curvature and convergence scalars stay f64-faithful at 10^6-state scale
    (SURVEY.md §7 hard-part 1)."""
    from ..utils.compensated import compensated_dot

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return sum(compensated_dot(x, y) for x, y in zip(la, lb))


def tree_add(a, b, sb=1.0):
    return jax.tree_util.tree_map(lambda x, y: x + sb * y, a, b)


def tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)


def gradient(graph, lins, values):
    """g = sum J^T r per group: {group: (N_g, dim_g)}."""
    sizes = graph.group_sizes(values)
    dtype = jax.tree_util.tree_leaves(values)[0].dtype
    g = {
        name: jnp.zeros((sizes[name], graph.manifolds[name].dim), dtype)
        for name in values
    }
    for batch, lin in zip(graph.batches, lins):
        for s, gname in enumerate(batch.groups):
            contrib = jnp.einsum("mri,mr->mi", lin.J[s], lin.r)
            g[gname] = g[gname].at[batch.idx[s]].add(contrib)
    return g


def hessian_vec(graph, lins, v):
    """H v matrix-free: {group: (N_g, dim_g)} -> same structure."""
    out = jax.tree_util.tree_map(jnp.zeros_like, v)
    for batch, lin in zip(graph.batches, lins):
        Jv = None
        for s, gname in enumerate(batch.groups):
            vs = v[gname][batch.idx[s]]
            term = jnp.einsum("mri,mi->mr", lin.J[s], vs)
            Jv = term if Jv is None else Jv + term
        for s, gname in enumerate(batch.groups):
            out[gname] = out[gname].at[batch.idx[s]].add(
                jnp.einsum("mri,mr->mi", lin.J[s], Jv)
            )
    return out


def block_diagonal(graph, lins, values):
    """Per-variable diagonal blocks of H: {group: (N_g, dim, dim)}."""
    sizes = graph.group_sizes(values)
    dtype = jax.tree_util.tree_leaves(values)[0].dtype
    D = {
        name: jnp.zeros(
            (sizes[name], graph.manifolds[name].dim, graph.manifolds[name].dim),
            dtype,
        )
        for name in values
    }
    for batch, lin in zip(graph.batches, lins):
        for s, gname in enumerate(batch.groups):
            blk = jnp.einsum("mri,mrj->mij", lin.J[s], lin.J[s])
            D[gname] = D[gname].at[batch.idx[s]].add(blk)
    return D
