"""Chain-structured assembly: linearized batches -> (block-tridiag + arrowhead)
system for the BCR/Schur solver (SURVEY.md §7 "second slice": scan+Schur path
covers Plaza-sized problems without general sparse Cholesky).

Structural contract (checked host-side in make_chain_solver, where index
arrays are concrete): every factor batch touches either
  - one state slot                       -> diagonal block
  - two state slots with idx_j = idx_i+1 -> diagonal + super-diagonal blocks
  - any of the above plus landmark slots -> arrowhead blocks
Loop closures (arbitrary i-j coupling) violate the contract; use the dense or
PCG backend for those graphs.

The check produces a STATIC role table (slot-pair -> which block structure to
scatter into); inside jit the assembler only consults the table — no data-
dependent branching. All scatters are `at[].add` with int32 index arrays —
the TPU equivalent of GTSAM's gather into frontal matrices (ref S6/S9).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from . import tridiag

# role table entry values
_DIAG = "diag"
_SUPER = "super"  # (s, t) with idx_t = idx_s + 1
_SKIP = "skip"  # lower-triangle duplicate, implicit by symmetry
_SL = "state_lm"
_LL = "lm_lm"
_LS = "lm_state"  # implicit by symmetry


def build_role_table(graph: Graph, state_group: str, lm_group: Optional[str]):
    """Host-side structural analysis (concrete index arrays required)."""
    roles = []
    for b in graph.batches:
        other = [g for g in b.groups if g not in (state_group, lm_group)]
        if other:
            raise ValueError(
                f"batch {b.name!r} touches groups {other} unsupported by the "
                f"chain solver"
            )
        state_slots = [s for s, g in enumerate(b.groups) if g == state_group]
        if len(state_slots) > 2:
            raise ValueError(f"batch {b.name!r} has >2 state slots")
        if len(state_slots) == 2:
            i = np.asarray(b.idx[state_slots[0]])
            j = np.asarray(b.idx[state_slots[1]])
            if not np.all(j == i + 1):
                raise ValueError(
                    f"batch {b.name!r} couples non-adjacent states; the chain "
                    f"solver requires j = i+1 (use the dense/PCG backend)"
                )
        table: Dict[Tuple[int, int], str] = {}
        for s, gs_name in enumerate(b.groups):
            for t, gt_name in enumerate(b.groups):
                if gs_name == state_group and gt_name == state_group:
                    if s == t:
                        table[(s, t)] = _DIAG
                    elif state_slots.index(s) == 0 and state_slots.index(t) == 1:
                        table[(s, t)] = _SUPER
                    else:
                        table[(s, t)] = _SKIP
                elif gs_name == state_group:
                    table[(s, t)] = _SL
                elif gt_name == state_group:
                    table[(s, t)] = _LS
                else:
                    table[(s, t)] = _LL
        roles.append(table)
    return roles


def assemble_chain(graph: Graph, lins, values, roles, state_group: str,
                   lm_group: Optional[str]):
    """Returns (D (N,b,b), U (N,b,b; U[N-1]=0), g_s (N,b),
                H_sl (N,b,P), H_ll (P,P), g_l (P,)); landmark parts None
    when lm_group is None."""
    man = graph.manifolds[state_group]
    b_dim = man.dim
    N = jax.tree_util.tree_leaves(values[state_group])[0].shape[0]
    dtype = jax.tree_util.tree_leaves(values)[0].dtype

    D = jnp.zeros((N, b_dim, b_dim), dtype)
    U = jnp.zeros((N, b_dim, b_dim), dtype)
    g_s = jnp.zeros((N, b_dim), dtype)

    if lm_group is not None:
        lm_man = graph.manifolds[lm_group]
        dl = lm_man.dim
        L = jax.tree_util.tree_leaves(values[lm_group])[0].shape[0]
        P = L * dl
        H_sl = jnp.zeros((N, b_dim, L, dl), dtype)
        H_ll = jnp.zeros((L, dl, L, dl), dtype)
        g_l = jnp.zeros((L, dl), dtype)
    else:
        H_sl = H_ll = g_l = None

    for batch, lin, table in zip(graph.batches, lins, roles):
        for s, gs_name in enumerate(batch.groups):
            Js = lin.J[s]
            contrib_g = jnp.einsum("mri,mr->mi", Js, lin.r)
            if gs_name == state_group:
                g_s = g_s.at[batch.idx[s]].add(contrib_g)
            else:
                g_l = g_l.at[batch.idx[s]].add(contrib_g)
            for t in range(len(batch.groups)):
                role = table[(s, t)]
                if role in (_SKIP, _LS):
                    continue
                blk = jnp.einsum("mri,mrj->mij", Js, lin.J[t])
                if role == _DIAG:
                    D = D.at[batch.idx[s]].add(blk)
                elif role == _SUPER:
                    U = U.at[batch.idx[s]].add(blk)
                elif role == _SL:
                    H_sl = H_sl.at[batch.idx[s], :, batch.idx[t], :].add(blk)
                elif role == _LL:
                    H_ll = H_ll.at[batch.idx[s], :, batch.idx[t], :].add(blk)

    if lm_group is not None:
        H_sl = H_sl.reshape(N, b_dim, P)
        H_ll = H_ll.reshape(P, P)
        g_l = g_l.reshape(P)
    return D, U, g_s, H_sl, H_ll, g_l


def make_chain_solver(graph: Graph, state_group: str = "state",
                      lm_group: Optional[str] = "landmark",
                      diagonal_damping: bool = False,
                      use_pallas: bool = False, pallas_min_n: int = 4096,
                      interpret: bool = False):
    """Build the chain+Schur linear solver after host-side structure checks.

    Returned callable matches the lm_solve solver interface:
    solver(graph, values, lins, lam) -> {group: (N_g, dim_g) delta}.

    use_pallas routes the BCR through the fused plane-major Pallas level
    kernels (ops/pallas_bcr.py; f32, b <= 8, big chains only — measured
    2-4x over the XLA path at Plaza1x27..1M states on v5e). Small chains,
    f64, and b > 8 silently fall through to the XLA unrolled path, so the
    flag is always safe to set.
    """
    if lm_group is not None and lm_group not in graph.manifolds:
        lm_group = None
    roles = build_role_table(graph, state_group, lm_group)

    def solver(graph, values, lins, lam):
        D, U, g_s, H_sl, H_ll, g_l = assemble_chain(
            graph, lins, values, roles, state_group, lm_group
        )
        dtype = D.dtype
        lam = jnp.asarray(lam, dtype)
        if lm_group is None:
            b = D.shape[-1]
            if diagonal_damping:
                dd = jnp.maximum(jnp.diagonal(D, axis1=-2, axis2=-1), 1e-10)
                D_damped = D + lam * jax.vmap(jnp.diag)(dd)
            else:
                D_damped = D + lam * jnp.eye(b, dtype=dtype)
            if use_pallas:
                from . import pallas_bcr

                ds = -pallas_bcr.bcr_solve_fused(
                    D_damped, U, g_s[..., None], interpret=interpret,
                )[..., 0]
            else:
                ds = -tridiag.bcr_solve(
                    D_damped, U, g_s[..., None],
                    pallas_min_n=pallas_min_n, interpret=interpret,
                )[..., 0]
            return {state_group: ds}
        ds, dl = tridiag.schur_arrowhead_solve(
            D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping,
            use_pallas=use_pallas, pallas_min_n=pallas_min_n,
            interpret=interpret,
        )
        lm_man = graph.manifolds[lm_group]
        return {
            state_group: ds,
            lm_group: dl.reshape(-1, lm_man.dim),
        }

    return solver
