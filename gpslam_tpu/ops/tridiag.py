"""Block-tridiagonal solver via block cyclic reduction (BCR) + landmark Schur
complement — the structure-exploiting fast path (SURVEY.md §2.3 "key sparsity
facts", §5.7 mechanism 2-3).

The GP prior makes the trajectory Hessian block-tridiagonal; landmarks add an
arrowhead. Where the reference runs a *sequential* multifrontal elimination
over this chain (GTSAM, SURVEY.md §3.1 hot loop #2), the TPU-native solve is
block cyclic reduction: log2(N) levels, each level a BATCHED dense
Cholesky/solve/matmul over half the remaining chain — O(N) work at O(log N)
depth, every op a large batched matmul that XLA maps onto the MXU. No
orderings, no trees, no gathers: every level is pure strided slicing.

Arrowhead (landmarks) handled by Schur complement: eliminate the trajectory
with BCR using [g_s | H_sl] as multiple right-hand sides (one extra solve
column per landmark coordinate — free batching), then solve the small dense
landmark system and back-substitute.

Conventions:
  D (N, b, b)   diagonal blocks (SPD after damping)
  U (N, b, b)   U[i] couples block i to i+1; U[N-1] is ZERO padding
  r (N, b, k)   right-hand sides
Solves H x = r where H = blocktridiag(U^T, D, U).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import smallblock as sb

_chol_solve = sb.chol_solve


def _pad_pow2(D, U, r):
    """Pad the chain to a power-of-two length with identity/zero blocks.

    The pad blocks are decoupled (U=0 at the boundary), so the solution on
    the original range is unchanged.
    """
    n, b, _ = D.shape
    m = 1 << (n - 1).bit_length()
    if m == n:
        return D, U, r, n
    eye = jnp.broadcast_to(jnp.eye(b, dtype=D.dtype), (m - n, b, b))
    D = jnp.concatenate([D, eye], 0)
    U = jnp.concatenate([U, jnp.zeros((m - n, b, b), D.dtype)], 0)
    r = jnp.concatenate([r, jnp.zeros((m - n, b, r.shape[-1]), D.dtype)], 0)
    return D, U, r, n


def bcr_solve(D, U, r, use_pallas: bool = False, pallas_min_n: int = 4096,
              interpret: bool = False):
    """Solve the SPD block-tridiagonal system; returns x (N, b, k).

    Python recursion over log2(N) levels unrolls at trace time into a static
    program of batched ops (shapes halve per level).

    use_pallas swaps the per-level "Cholesky + multi-RHS solve" into the
    fused lanes-major Pallas kernel (ops/pallas_chol.py) on levels with at
    least pallas_min_n odd blocks (small levels stay on the XLA unrolled
    path — kernel launch overhead dominates there). interpret=True runs the
    kernel in interpreter mode (CPU tests; §5.2 sanitizer discipline).
    """
    D, U, r, n_orig = _pad_pow2(D, U, r)
    x = _bcr(D, U, r, use_pallas, pallas_min_n, interpret)
    return x[:n_orig]


def bcr_solve_auto(D, U, r, use_pallas: bool = True,
                   interpret: bool = False):
    """bcr_solve with the fused Pallas level kernels on big f32 chains
    (ops/pallas_bcr.py; falls through to the XLA path for small N, f64, or
    big blocks)."""
    if use_pallas:
        from . import pallas_bcr

        return pallas_bcr.bcr_solve_fused(D, U, r, interpret=interpret)
    return bcr_solve(D, U, r)


def _level_chol_solve(D_blocks, B, use_pallas, pallas_min_n, interpret):
    """A X = B for a level's odd blocks: fused Pallas kernel on big levels,
    unrolled XLA elsewhere. Returns X only (no factor reuse on the Pallas
    path: recomputing the b^3/3 Cholesky is cheaper than a second HBM pass)."""
    if (use_pallas and D_blocks.shape[0] >= pallas_min_n
            and D_blocks.dtype == jnp.float32
            and D_blocks.shape[-1] <= 8):
        from . import pallas_chol

        return pallas_chol.chol_solve_lanes(D_blocks, B, interpret=interpret)
    return _chol_solve(sb.cholesky(D_blocks), B)


def _bcr(D, U, r, use_pallas=False, pallas_min_n=4096, interpret=False):
    n = D.shape[0]
    if n == 1:
        L = sb.cholesky(D)
        return _chol_solve(L, r)

    b = D.shape[-1]
    D_even, D_odd = D[0::2], D[1::2]
    U_eo = U[0::2]  # U[2j]   : couples 2j   <-> 2j+1
    U_oe = U[1::2]  # U[2j+1] : couples 2j+1 <-> 2j+2 (last entry is 0-pad)
    r_even, r_odd = r[0::2], r[1::2]

    # S1[j] = U[2j]   D_odd[j]^{-1}  (b, b)
    # S2[j] = U[2j+1]^T D_odd[j]^{-1}
    # one fused solve against the stacked right-hand sides [U_eo^T | U_oe]
    sol = _level_chol_solve(
        D_odd,
        jnp.concatenate([jnp.swapaxes(U_eo, -1, -2), U_oe], axis=-1),
        use_pallas, pallas_min_n, interpret,
    )
    S1 = jnp.swapaxes(sol[..., :b], -1, -2)
    S2 = jnp.swapaxes(sol[..., b:], -1, -2)

    # reduced system on the even indices
    D_red = D_even - sb.matmul_hp(S1, jnp.swapaxes(U_eo, -1, -2))
    # left-odd contribution S2[j-1] @ U[2j-1], shifted (zero for j=0)
    left = sb.matmul_hp(S2, U_oe)
    D_red = D_red - jnp.concatenate([jnp.zeros_like(left[:1]), left[:-1]], 0)
    U_red = -sb.matmul_hp(S1, U_oe)  # couples even 2j <-> 2j+2; last entry stays 0 (pad)
    r_red = r_even - sb.matmul_hp(S1, r_odd)
    rl = sb.matmul_hp(S2, r_odd)
    r_red = r_red - jnp.concatenate([jnp.zeros_like(rl[:1]), rl[:-1]], 0)

    x_even = _bcr(D_red, U_red, r_red, use_pallas, pallas_min_n, interpret)

    # back-substitute the odd unknowns:
    # x[2j+1] = D_odd[j]^{-1} (r_odd[j] - U[2j]^T x[2j] - U[2j+1] x[2j+2])
    x_next = jnp.concatenate([x_even[1:], jnp.zeros_like(x_even[:1])], 0)
    rhs_odd = (r_odd - sb.matmul_hp(jnp.swapaxes(U_eo, -1, -2), x_even)
               - sb.matmul_hp(U_oe, x_next))
    x_odd = _level_chol_solve(D_odd, rhs_odd, use_pallas, pallas_min_n,
                              interpret)

    # interleave even/odd
    x = jnp.stack([x_even, x_odd], axis=1).reshape(
        2 * x_even.shape[0], *x_even.shape[1:]
    )
    return x


def schur_arrowhead_solve(D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping,
                          use_pallas: bool = False, pallas_min_n: int = 4096,
                          interpret: bool = False):
    """Solve the damped arrowhead system (trajectory chain + landmarks).

      [ H_ss  H_sl ] [ds]   [-g_s]
      [ H_sl' H_ll ] [dl] = [-g_l]

    D (N,b,b), U (N,b,b; U[N-1]=0), g_s (N,b), H_sl (N,b,P) with P = L*dl the
    flattened landmark tangent, H_ll (P,P), g_l (P,). Damping lam is added to
    the diagonals (diag(H) scaling if diagonal_damping else identity).
    Returns (ds (N,b), dl (P,)).
    """
    N, b, _ = D.shape
    P = g_l.shape[0]
    dtype = D.dtype
    if diagonal_damping:
        d_s = jnp.maximum(
            jnp.diagonal(D, axis1=-2, axis2=-1), 1e-10
        )  # (N, b)
        D_damped = D + lam * jax.vmap(jnp.diag)(d_s)
        d_l = jnp.maximum(jnp.diagonal(H_ll), 1e-10)
        H_ll_damped = H_ll + lam * jnp.diag(d_l)
    else:
        eye_b = jnp.eye(b, dtype=dtype)
        D_damped = D + lam * eye_b
        H_ll_damped = H_ll + lam * jnp.eye(P, dtype=dtype)

    # BCR with k = 1 + P right-hand sides: [g_s | H_sl]
    rhs = jnp.concatenate([g_s[..., None], H_sl], axis=-1)  # (N, b, 1+P)
    if use_pallas:
        from . import pallas_bcr

        sol = pallas_bcr.bcr_solve_fused(D_damped, U, rhs,
                                         interpret=interpret)
    else:
        sol = bcr_solve(D_damped, U, rhs, pallas_min_n=pallas_min_n,
                        interpret=interpret)
    z = sol[..., 0]  # H_ss^{-1} g_s       (N, b)
    Y = sol[..., 1:]  # H_ss^{-1} H_sl     (N, b, P)

    # Schur complement on the landmarks
    S = H_ll_damped - jnp.einsum("nbp,nbq->pq", H_sl, Y, precision="highest")
    rhs_l = -g_l + jnp.einsum("nbp,nb->p", H_sl, z, precision="highest")
    L_S = jnp.linalg.cholesky(S)
    dl = _chol_solve(L_S, rhs_l[:, None])[:, 0]

    ds = -z - jnp.einsum("nbp,p->nb", Y, dl, precision="highest")
    return ds, dl
