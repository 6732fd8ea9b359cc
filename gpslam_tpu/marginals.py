"""Marginal covariances (SURVEY.md §2.2 S12, call stack §3.5).

Replaces GTSAM's Bayes-tree shortcut machinery with structure-exploiting
closed recurrences on the chain+arrowhead system:

  block-tridiagonal selected inverse (Takahashi-style):
    forward:   P_0 = D_0;  P_i = D_i - U_{i-1}^T P_{i-1}^{-1} U_{i-1}
    backward:  S_{N-1} = P_{N-1}^{-1}
               S_i = P_i^{-1} + P_i^{-1} U_i S_{i+1} U_i^T P_i^{-1}
  (these are exactly the Kalman-filter / RTS covariance recursions; both are
  lax.scans of (b,b) block ops — parallelizable later via associative scan)

  landmark correction (arrowhead):
    (H^{-1})_ss,ii = S_i + Y_i Sc^{-1} Y_i^T,  Y = H_ss^{-1} H_sl,
    Sc = H_ll - H_sl^T H_ss^{-1} H_sl;   (H^{-1})_ll = Sc^{-1}.

All covariances are in the tangent space at the evaluation point (GTSAM
Marginals semantics). A dense fallback covers arbitrary (small) graphs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .graph import graph as graphlib
from .ops import chain as chain_ops
from .ops import dense as dense_ops


def _inv_psd(A):
    """Batched PSD inverse via Cholesky."""
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def tridiag_selected_inverse(D, U):
    """Diagonal blocks of inv(blocktridiag(U^T, D, U)): (N, b, b).

    Also returns the forward Schur blocks P (for joint marginals).
    """
    N = D.shape[0]

    def fwd(P_prev, inputs):
        D_i, U_prev = inputs
        # P_i = D_i - U_{i-1}^T P_{i-1}^{-1} U_{i-1}
        Pinv = _inv_psd(P_prev)
        P_i = D_i - jnp.swapaxes(U_prev, -1, -2) @ Pinv @ U_prev
        return P_i, P_i

    # i = 0 has no predecessor: seed with P_0 = D_0 and scan the rest
    P0 = D[0]
    _, P_rest = jax.lax.scan(fwd, P0, (D[1:], U[:-1]))
    P = jnp.concatenate([P0[None], P_rest], 0)

    def bwd(S_next, inputs):
        P_i, U_i = inputs
        Pinv = _inv_psd(P_i)
        S_i = Pinv + Pinv @ U_i @ S_next @ jnp.swapaxes(U_i, -1, -2) @ Pinv
        return S_i, S_i

    S_last = _inv_psd(P[-1])
    _, S_rest = jax.lax.scan(bwd, S_last, (P[:-1], U[:-1]), reverse=True)
    Sigma = jnp.concatenate([S_rest, S_last[None]], 0)
    return Sigma, P


def tridiag_cross_covariances(Sigma, P, U):
    """Adjacent off-diagonal blocks Sigma_{i,i+1} of the selected inverse:
    Sigma_{i,i+1} = -P_i^{-1} U_i Sigma_{i+1,i+1} (Takahashi companion to the
    backward recurrence). Returns (N-1, b, b)."""
    return -_inv_psd(P[:-1]) @ U[:-1] @ Sigma[1:]


def tridiag_cross_at(Sigma, P, U, rows, cols):
    """ARBITRARY off-diagonal blocks Sigma_{rows[m], cols[m]} of the
    block-tridiagonal selected inverse (the reference's JointMarginal over
    non-adjacent variables, SURVEY.md §2.2 S12).

    Uses the off-diagonal recurrence Sigma_{i,j} = G_i Sigma_{i+1,j}
    (i < j) with gains G_i = -P_i^{-1} U_i, i.e.

        Sigma_{i,j} = (prod_{l=i}^{j-1} G_l) Sigma_{j,j},      i <= j,

    evaluated by one masked scan over the chain per requested pair (vmapped;
    O(M N) small-block matmuls — intended for post-solve analysis with
    modest M). Pairs with rows > cols return the transpose block; rows ==
    cols returns the diagonal block. Shapes: rows/cols (M,) -> (M, b, b).
    """
    N, b = Sigma.shape[0], Sigma.shape[-1]
    G = -_inv_psd(P[:-1]) @ U[:-1]  # (N-1, b, b)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    lo = jnp.minimum(rows, cols)
    hi = jnp.maximum(rows, cols)

    def one(lo_m, hi_m):
        def step(C, inputs):
            l, G_l = inputs
            take = (l >= lo_m) & (l < hi_m)
            return jnp.where(take, C @ G_l, C), None

        C0 = jnp.eye(b, dtype=Sigma.dtype)
        C, _ = jax.lax.scan(step, C0, (jnp.arange(N - 1), G))
        return C @ Sigma[hi_m]

    X = jax.vmap(one)(lo, hi)  # Sigma_{lo, hi}
    return jnp.where((rows <= cols)[:, None, None], X,
                     jnp.swapaxes(X, -1, -2))


def chain_selected_inverse_parts(graph, values, state_group: str = "state",
                                 lm_group: Optional[str] = "landmark"):
    """Raw pieces of the chain selected inverse for cross-covariance queries:
    (Sigma_diag (N,b,b), P, U, Y, Sc_inv), with Y = H_ss^{-1} H_sl and
    Sc_inv = (H_ll - H_sl^T Y)^{-1} the landmark-arrowhead correction
    (Y, Sc_inv are None without landmarks). The FULL selected-inverse block
    at (i, j) is  tridiag_cross_at(...)[m] + Y_i Sc_inv Y_j^T."""
    if lm_group is not None and lm_group not in graph.manifolds:
        lm_group = None
    roles = chain_ops.build_role_table(graph, state_group, lm_group)
    lins = graphlib.linearize(graph, values)
    D, U, g_s, H_sl, H_ll, g_l = chain_ops.assemble_chain(
        graph, lins, values, roles, state_group, lm_group
    )
    Sigma, P = tridiag_selected_inverse(D, U)
    if lm_group is None:
        return Sigma, P, U, None, None
    from .ops.tridiag import bcr_solve

    Y = bcr_solve(D, U, H_sl)
    Sc = H_ll - jnp.einsum("nbp,nbq->pq", H_sl, Y)
    return Sigma, P, U, Y, _inv_psd(Sc)


def chain_joint_marginals(graph, values, state_group: str = "state",
                          lm_group: Optional[str] = "landmark"):
    """Chain marginals PLUS adjacent joint blocks: returns
    (Sigma_diag (N, b, b), Sigma_cross (N-1, b, b)[, Sigma_lm]) — the joint
    covariance of each bracketing state pair, which is exactly what posterior
    interpolation at arbitrary times needs (query.py).
    Both include the landmark arrowhead correction."""
    if lm_group is not None and lm_group not in graph.manifolds:
        lm_group = None
    roles = chain_ops.build_role_table(graph, state_group, lm_group)
    lins = graphlib.linearize(graph, values)
    D, U, g_s, H_sl, H_ll, g_l = chain_ops.assemble_chain(
        graph, lins, values, roles, state_group, lm_group
    )
    Sigma, P = tridiag_selected_inverse(D, U)
    cross = tridiag_cross_covariances(Sigma, P, U)
    if lm_group is None:
        return Sigma, cross, None

    from .ops.tridiag import bcr_solve

    Y = bcr_solve(D, U, H_sl)  # (N, b, P) = H_ss^{-1} H_sl
    Sc = H_ll - jnp.einsum("nbp,nbq->pq", H_sl, Y)
    Sc_inv = _inv_psd(Sc)
    Sigma = Sigma + jnp.einsum("nbp,pq,ncq->nbc", Y, Sc_inv, Y)
    cross = cross + jnp.einsum("nbp,pq,ncq->nbc", Y[:-1], Sc_inv, Y[1:])
    dl = graph.manifolds[lm_group].dim
    Lm = Sc.shape[0] // dl
    Sll = Sc_inv.reshape(Lm, dl, Lm, dl)
    Sll_diag = jnp.stack([Sll[i, :, i, :] for i in range(Lm)], 0)
    return Sigma, cross, Sll_diag


def joint_marginal_covariance(graph, values, indices,
                              state_group: str = "state",
                              lm_group: Optional[str] = "landmark"):
    """GTSAM `Marginals::jointMarginalCovariance(KeyVector)` equivalent on a
    GP chain: the FULL joint tangent-space covariance over an arbitrary
    subset of chain states (any gaps, any order). Returns (K, K, b, b) with
    block [a, c] = Cov(x_{indices[a]}, x_{indices[c]}); stack with
    `.transpose(0, 2, 1, 3).reshape(K*b, K*b)` for the flat matrix.

    Off-diagonal blocks come from the gain-product propagation of the
    selected inverse (tridiag_cross_at); the landmark arrowhead correction
    Y_i Sc^{-1} Y_j^T is applied to every block. Only the strict upper
    triangle runs the O(N) masked scans — the diagonal is Sigma[idx] and the
    lower triangle is the mirrored transpose (K(K-1)/2 scans, not K^2)."""
    import numpy as np

    Sigma, P, U, Y, Sc_inv = chain_selected_inverse_parts(
        graph, values, state_group, lm_group
    )
    idx = jnp.asarray(indices)
    K = idx.shape[0]
    b = Sigma.shape[-1]
    iu_a, iu_c = np.triu_indices(K, 1)
    J = jnp.zeros((K, K, b, b), Sigma.dtype)
    J = J.at[jnp.arange(K), jnp.arange(K)].set(Sigma[idx])
    if len(iu_a):
        X = tridiag_cross_at(Sigma, P, U, idx[iu_a], idx[iu_c])
        J = J.at[iu_a, iu_c].set(X)
        J = J.at[iu_c, iu_a].set(jnp.swapaxes(X, -1, -2))
    if Y is not None:
        Yi = Y[idx]
        J = J + jnp.einsum("abr,rs,cds->acbd", Yi, Sc_inv, Yi)
    return J


def chain_marginals(graph, values, state_group: str = "state",
                    lm_group: Optional[str] = "landmark"):
    """Marginal covariances for every chain state (and landmark) at `values`.

    Returns {state_group: (N, b, b)[, lm_group: (L, dl, dl)]}.
    """
    if lm_group is not None and lm_group not in graph.manifolds:
        lm_group = None
    roles = chain_ops.build_role_table(graph, state_group, lm_group)
    lins = graphlib.linearize(graph, values)
    D, U, g_s, H_sl, H_ll, g_l = chain_ops.assemble_chain(
        graph, lins, values, roles, state_group, lm_group
    )
    Sigma_ss, _ = tridiag_selected_inverse(D, U)
    if lm_group is None:
        return {state_group: Sigma_ss}

    # landmark Schur complement and the state correction
    from .ops.tridiag import bcr_solve

    Y = bcr_solve(D, U, H_sl)  # (N, b, P) = H_ss^{-1} H_sl
    Sc = H_ll - jnp.einsum("nbp,nbq->pq", H_sl, Y)
    Sc_inv = _inv_psd(Sc)
    corr = jnp.einsum("nbp,pq,ncq->nbc", Y, Sc_inv, Y)
    dl = graph.manifolds[lm_group].dim
    L = Sc.shape[0] // dl
    Sigma_ll = Sc_inv.reshape(L, dl, L, dl)
    Sigma_ll_diag = jnp.stack([Sigma_ll[i, :, i, :] for i in range(L)], 0)
    return {state_group: Sigma_ss + corr, lm_group: Sigma_ll_diag}


def auto_marginals(graph, values, state_group: str = "state",
                   lm_group: Optional[str] = "landmark"):
    """GTSAM `Marginals`-equivalent entry point: per-variable tangent
    covariances with automatic backend selection (mirrors solve.auto):
    chain+arrowhead recurrences when the graph is a GP chain, otherwise the
    supernodal selected inverse, dense for tiny graphs."""
    from .ops import chain as chain_ops_mod

    try:
        chain_ops_mod.build_role_table(
            graph, state_group,
            lm_group if lm_group in graph.manifolds else None)
        return chain_marginals(graph, values, state_group, lm_group)
    except (ValueError, KeyError):
        pass
    total_tangent = sum(
        jax.tree_util.tree_leaves(v)[0].shape[0] * graph.manifolds[g].dim
        for g, v in values.items()
    )
    if total_tangent <= 300:
        return dense_marginals(graph, values)
    return supernodal_marginals(graph, values)


def supernodal_marginals(graph, values, solver=None, amalgamate: bool = True,
                         w_max: int = 4):
    """Marginal covariances for ARBITRARY sparse graphs (loop-closure pose
    graphs, mixed pose+landmark) via the blocked Takahashi selected inverse
    over the supernodal level schedules — the S12 path for everything the
    chain recurrences don't cover, replacing GTSAM's Bayes-tree shortcut
    machinery (SURVEY.md §3.5) without ever forming H^{-1}.

    Pass `solver` (a SupernodalSolver built on this graph) to reuse its
    symbolic analysis; otherwise one is constructed here.
    Returns {group: (N_g, d_g, d_g)} tangent-space covariances at `values`.
    """
    if solver is None:
        if amalgamate:
            from .ops.amalgamated import AmalgamatedSupernodalSolver

            solver = AmalgamatedSupernodalSolver(graph, values, w_max=w_max)
        else:
            from .ops.supernodal import SupernodalSolver

            solver = SupernodalSolver(graph, values)
    lins = graphlib.linearize(graph, values)
    blocks, _ = solver.assemble_raw(graph, lins, values)
    blocks = solver.add_damping(blocks, 0.0)  # identity on padded dims only
    L = solver.factorize(blocks)
    S = solver.selected_inverse(L)
    return solver.diag_marginals(S, graph)


def supernodal_joint_marginals(graph, values, pairs, solver=None):
    """Pairwise joint covariances on ARBITRARY sparse graphs (loop closures,
    mixed pose/landmark) — GTSAM `Marginals::jointMarginalCovariance` for
    variable pairs inside the fill pattern (any two variables sharing a
    factor qualify). pairs: [((group_i, idx_i), (group_j, idx_j)), ...] ->
    list of (d_i + d_j, d_i + d_j) joint tangent covariances.

    Uses the blocked Takahashi selected inverse over the supernodal
    schedule. Pass `solver` (a SupernodalSolver OR AmalgamatedSupernodalSolver
    built on this graph, e.g. the one supernodal_marginals used) to reuse its
    symbolic analysis — each class extracts joint blocks from its own storage
    layout; out-of-pattern pairs raise with a pointer to the dense
    fallback."""
    if solver is None:
        from .ops.supernodal import SupernodalSolver

        solver = SupernodalSolver(graph, values)
    lins = graphlib.linearize(graph, values)
    blocks, _ = solver.assemble_raw(graph, lins, values)
    blocks = solver.add_damping(blocks, 0.0)
    L = solver.factorize(blocks)
    S = solver.selected_inverse(L)
    return solver.joint_marginal_pairs(S, graph, pairs)


def dense_marginals(graph, values):
    """Dense fallback for arbitrary small graphs: block-diagonal of H^{-1}
    per variable. Returns {group: (N_g, dim_g, dim_g)}."""
    layout, Dtot = dense_ops.tangent_layout(graph, values)
    dtype = jax.tree_util.tree_leaves(values)[0].dtype
    lins = graphlib.linearize(graph, values)
    H, _ = dense_ops.assemble_dense(graph, lins, layout, Dtot, dtype)
    Sigma = _inv_psd(H)
    out = {}
    sizes = graph.group_sizes(values)
    for g, (off, d) in layout.items():
        n = sizes[g]
        blocks = []
        for i in range(n):
            s = off + i * d
            blocks.append(jax.lax.dynamic_slice(Sigma, (s, s), (d, d)))
        out[g] = jnp.stack(blocks, 0)
    return out
