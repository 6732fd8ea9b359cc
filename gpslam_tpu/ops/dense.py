"""Dense normal-equation assembly and solve — the small-problem reference
backend (SURVEY.md §7 "minimum end-to-end slice").

Replaces the reference's GaussianFactorGraph -> multifrontal pipeline for
problems small enough that one dense (D, D) Hessian fits comfortably: H and
g = J^T r are scatter-assembled from the per-batch linearizations with
`at[].add` (XLA scatter-add, the segment-sum moral equivalent), then solved
with a dense Cholesky. The structured backends (ops/tridiag.py Schur/scan
paths, Pallas supernodal) reuse the same LinearizedBatch input format.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..graph.graph import Graph, LinearizedBatch


def tangent_layout(graph: Graph, values) -> Tuple[Dict[str, Tuple[int, int]], int]:
    """Per-group (offset, tangent_dim) in the global tangent vector; total D.

    Group order is the (deterministic) insertion order of `values`.
    """
    layout = {}
    off = 0
    for g, v in values.items():
        man = graph.manifolds[g]
        n = graph.group_sizes(values)[g]
        layout[g] = (off, man.dim)
        off += n * man.dim
    return layout, off


def assemble_dense(graph: Graph, lins, layout, total_dim: int, dtype):
    """(H, g) with H = sum J^T J (D, D), g = sum J^T r (D,)."""
    H = jnp.zeros((total_dim, total_dim), dtype)
    g = jnp.zeros((total_dim,), dtype)
    for batch, lin in zip(graph.batches, lins):
        nslots = len(batch.groups)
        rows = []
        for s in range(nslots):
            off, dim = layout[batch.groups[s]]
            # (M, dim) global row indices of slot s's tangent block
            rows.append(off + batch.idx[s][:, None] * dim + jnp.arange(dim)[None, :])
        for s in range(nslots):
            Js = lin.J[s]  # (M, rdim, dim_s)
            g = g.at[rows[s]].add(jnp.einsum("mri,mr->mi", Js, lin.r))
            for t in range(nslots):
                blk = jnp.einsum("mri,mrj->mij", Js, lin.J[t])
                H = H.at[rows[s][:, :, None], rows[t][:, None, :]].add(blk)
    return H, g


def solve_dense(H, g, lam, diagonal_damping: bool):
    """Solve the damped system (H + lam*D) delta = -g by dense Cholesky.

    D = diag(H) (LM diagonal damping, clamped >= 1e-10) or I. Returns delta.
    """
    if diagonal_damping:
        d = jnp.maximum(jnp.diagonal(H), 1e-10)
    else:
        d = jnp.ones_like(g)
    A = H + jnp.diag(lam * d)
    L = jnp.linalg.cholesky(A)
    y = jnp.linalg.solve(L, -g[..., None])
    delta = jnp.linalg.solve(L.T, y)[..., 0]
    return delta


def split_delta(delta, graph: Graph, values, layout):
    """Global tangent vector -> {group: (N_g, dim_g)}."""
    out = {}
    sizes = graph.group_sizes(values)
    for g, (off, dim) in layout.items():
        n = sizes[g]
        out[g] = delta[off : off + n * dim].reshape(n, dim)
    return out
