"""Trajectory (time-axis) sharding — SURVEY.md §2.4 P4 / §5.7: the
sequence-parallel path, the framework's ring-attention analog.

`spike_solve` is a distributed SPD block-tridiagonal solve over a 1-D mesh
axis: each device holds a contiguous chunk of the chain (D, U, r sharded on
the leading axis inside shard_map) and

  1. eliminates its chunk INTERIOR with a local BCR solve, carrying the
     right-hand sides plus one b-column block per boundary (the classic
     SPIKE / substructuring reduction);
  2. all_gathers the 2-per-device reduced boundary blocks into a tiny
     (2*n_dev, b, b) block-tridiagonal system, solved REPLICATED by BCR
     (payload per device: O(b^2) — the "halo" is two states wide);
  3. back-substitutes its interior locally.

Communication per solve: ONE all_gather of the reduced system — lowered by
XLA to ICI. Composes with the landmark Schur complement by carrying the
H_sl columns as extra right-hand sides, exactly like ops/tridiag.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import smallblock as sb
from ..ops.tridiag import bcr_solve


def spike_solve(D_loc, U_loc, r_loc, axis_name: str):
    """Distributed solve inside shard_map: each device passes ITS chunk.

    D_loc (m, b, b), U_loc (m, b, b) — U_loc[j] couples local j to j+1;
    U_loc[m-1] couples to the NEXT device's first state (zero on the last
    device). r_loc (m, b, k). Returns x_loc (m, b, k). Requires m >= 4.
    """
    m, b_dim, _ = D_loc.shape
    k = r_loc.shape[-1]
    if m < 4:
        raise ValueError(f"chunk length {m} < 4; repartition the chain")
    n_dev = jax.lax.psum(1, axis_name)
    c = jax.lax.axis_index(axis_name)

    # ---- 1. interior elimination (local states 1..m-2)
    D_int = D_loc[1:-1]
    U_int = jnp.concatenate(
        [U_loc[1 : m - 2], jnp.zeros((1, b_dim, b_dim), D_loc.dtype)], 0
    )
    # coupling columns: interior row 0 <- boundary 0 via U_loc[0]^T;
    # interior row m-3 <- boundary m-1 via U_loc[m-2]
    E_L = jnp.zeros((m - 2, b_dim, b_dim), D_loc.dtype).at[0].set(
        jnp.swapaxes(U_loc[0], -1, -2)
    )
    E_R = jnp.zeros((m - 2, b_dim, b_dim), D_loc.dtype).at[m - 3].set(
        U_loc[m - 2]
    )
    rhs = jnp.concatenate([r_loc[1:-1], E_L, E_R], axis=-1)
    sol = bcr_solve(D_int, U_int, rhs)
    z = sol[..., :k]  # H_int^{-1} g_int
    Y_L = sol[..., k : k + b_dim]  # H_int^{-1} E_L
    Y_R = sol[..., k + b_dim :]  # H_int^{-1} E_R

    # ---- 2. reduced boundary system (2 nodes per device)
    D0r = D_loc[0] - sb.matmul_hp(U_loc[0], Y_L[0])
    W = -sb.matmul_hp(U_loc[0], Y_R[0])  # own-boundary coupling b0 <-> b1
    UT = jnp.swapaxes(U_loc[m - 2], -1, -2)
    D1r = D_loc[m - 1] - sb.matmul_hp(UT, Y_R[m - 3])
    g0r = r_loc[0] - sb.matmul_hp(U_loc[0], z[0])
    g1r = r_loc[m - 1] - sb.matmul_hp(UT, z[m - 3])

    D_red_loc = jnp.stack([D0r, D1r], 0)  # (2, b, b)
    U_red_loc = jnp.stack([W, U_loc[m - 1]], 0)  # (2, b, b)
    g_red_loc = jnp.stack([g0r, g1r], 0)  # (2, b, k)

    D_red = jax.lax.all_gather(D_red_loc, axis_name).reshape(
        2 * n_dev, b_dim, b_dim
    )
    U_red = jax.lax.all_gather(U_red_loc, axis_name).reshape(
        2 * n_dev, b_dim, b_dim
    )
    g_red = jax.lax.all_gather(g_red_loc, axis_name).reshape(2 * n_dev, b_dim, k)

    x_red = bcr_solve(D_red, U_red, g_red)  # replicated tiny solve
    x0 = x_red[2 * c]
    x1 = x_red[2 * c + 1]

    # ---- 3. local back-substitution
    x_int = z - sb.matmul_hp(Y_L, x0[None]) - sb.matmul_hp(Y_R, x1[None])
    return jnp.concatenate([x0[None], x_int, x1[None]], 0)


def spike_schur_arrowhead_solve(D_loc, U_loc, g_loc, H_sl_loc, H_ll, g_l,
                                lam, axis_name: str):
    """Distributed chain + replicated-landmark arrowhead solve (the sharded
    twin of ops.tridiag.schur_arrowhead_solve).

    D/U/g/H_sl sharded by time chunk; H_ll (P, P) and g_l (P,) replicated.
    Returns (ds_loc (m, b), dl (P,) replicated).
    """
    m, b_dim, _ = D_loc.shape
    P = g_l.shape[0]
    dtype = D_loc.dtype
    D_damped = D_loc + lam * jnp.eye(b_dim, dtype=dtype)
    H_ll_damped = H_ll + lam * jnp.eye(P, dtype=dtype)

    rhs = jnp.concatenate([g_loc[..., None], H_sl_loc], axis=-1)
    sol = spike_solve(D_damped, U_loc, rhs, axis_name)
    z = sol[..., 0]
    Y = sol[..., 1:]

    S_part = jnp.einsum("nbp,nbq->pq", H_sl_loc, Y, precision="highest")
    rl_part = jnp.einsum("nbp,nb->p", H_sl_loc, z, precision="highest")
    S_sum, rl_sum = jax.lax.psum((S_part, rl_part), axis_name)
    S = H_ll_damped - S_sum
    rhs_l = -g_l + rl_sum
    L_S = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(L_S, rhs_l[:, None], lower=True)
    dl = jax.scipy.linalg.solve_triangular(L_S.T, y, lower=False)[:, 0]

    ds = -z - jnp.einsum("nbp,p->nb", Y, dl, precision="highest")
    return ds, dl
