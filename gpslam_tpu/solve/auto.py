"""Automatic linear-solver backend selection (the moral equivalent of the
reference's EliminatePreferCholesky defaults: users shouldn't have to know
the elimination machinery to get the right solver).

Order of preference:
  1. chain + arrowhead BCR/Schur — if the graph satisfies the chain
     structure contract (GP trajectories; by far the fastest);
  2. supernodal sparse Cholesky — exact, general sparsity, best for
     small/medium irregular graphs (loop closures);
  3. block-Jacobi PCG — matrix-free, for large irregular graphs where the
     supernodal level schedule would blow up compile time;
  4. dense — tiny problems.
"""

from __future__ import annotations

import jax

from ..ops import chain as chain_ops
from ..ops import pcg as pcg_ops
from .lm import make_dense_solver

# host-side heuristics
_DENSE_MAX_TANGENT = 300  # dense H at most ~300x300
_SUPERNODAL_MAX_VARS = 3000  # beyond this the level schedule compile grows


def auto_solver(graph, values, state_group: str = "state",
                lm_group: str = "landmark", diagonal_damping: bool = False,
                verbose: bool = False):
    """Pick a linear solver for (graph, values). Host-side; returns a
    solver callable for lm_solve/gn_solve/dogleg_solve."""
    # 1. chain structure?
    try:
        solver = chain_ops.make_chain_solver(
            graph, state_group=state_group, lm_group=lm_group,
            diagonal_damping=diagonal_damping,
        )
        if verbose:
            print("auto_solver: chain (BCR + Schur)")
        return solver
    except (ValueError, KeyError):
        pass

    n_vars = sum(
        jax.tree_util.tree_leaves(v)[0].shape[0] for v in values.values()
    )
    total_tangent = sum(
        jax.tree_util.tree_leaves(v)[0].shape[0] * graph.manifolds[g].dim
        for g, v in values.items()
    )
    if total_tangent <= _DENSE_MAX_TANGENT:
        if verbose:
            print("auto_solver: dense")
        return make_dense_solver(diagonal_damping)
    if n_vars <= _SUPERNODAL_MAX_VARS:
        from ..ops.amalgamated import AmalgamatedSupernodalSolver

        if verbose:
            print("auto_solver: amalgamated supernodal sparse Cholesky")
        return AmalgamatedSupernodalSolver(graph, values).solver
    if verbose:
        print("auto_solver: block-Jacobi PCG")
    return pcg_ops.make_pcg_solver(diagonal_damping=diagonal_damping)
