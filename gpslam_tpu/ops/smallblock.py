"""Unrolled small-block dense kernels: Cholesky / triangular solves for the
tiny (b <= ~16) blocks of the chain solvers, b static.

Why not jnp.linalg: LAPACK-style factorizations lower to loop-heavy,
launch-bound code on TPU and (worse) route matmuls through the MXU's bf16
default precision — fatal for a *solver* (observed: LM non-convergence on
TPU with f32 inputs). Unrolling the b*(b+1)/2 scalar recurrences turns each
block op into a handful of full-precision ELEMENTWISE ops batched over the
chain dimension — exactly the VPU's shape (SURVEY.md §7 hard-part 1-2).

All functions broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

# blocks at or below this size use the unrolled path; above, jnp.linalg
MAX_UNROLL = 16


def cholesky(A):
    """Lower Cholesky of SPD (..., b, b), unrolled Cholesky-Crout."""
    b = A.shape[-1]
    if b > MAX_UNROLL:
        return jnp.linalg.cholesky(A)
    L = [[None] * b for _ in range(b)]
    for j in range(b):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, b):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = []
    zero = jnp.zeros_like(A[..., 0, 0])
    for i in range(b):
        rows.append(jnp.stack([L[i][j] if j <= i else zero for j in range(b)], -1))
    return jnp.stack(rows, -2)


def solve_lower(L, B):
    """X with L X = B; L (..., b, b) lower, B (..., b, k). Unrolled."""
    b = L.shape[-2]
    if b > MAX_UNROLL:
        import jax

        return jax.scipy.linalg.solve_triangular(L, B, lower=True)
    X = [None] * b
    for i in range(b):
        s = B[..., i, :]
        for j in range(i):
            s = s - L[..., i, j, None] * X[j]
        X[i] = s / L[..., i, i, None]
    return jnp.stack(X, -2)


def solve_upper_from_lower(L, B):
    """X with L^T X = B (upper solve using the lower factor). Unrolled."""
    b = L.shape[-2]
    if b > MAX_UNROLL:
        import jax

        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), B, lower=False
        )
    X = [None] * b
    for i in reversed(range(b)):
        s = B[..., i, :]
        for j in range(i + 1, b):
            # (L^T)[i, j] = L[j, i]
            s = s - L[..., j, i, None] * X[j]
        X[i] = s / L[..., i, i, None]
    return jnp.stack(X, -2)


def chol_solve(L, B):
    """A X = B given L = cholesky(A)."""
    return solve_upper_from_lower(L, solve_lower(L, B))


def inv_psd(A):
    """PSD inverse via the unrolled Cholesky."""
    L = cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    return chol_solve(L, eye)


def matmul_hp(A, B):
    """Batched matmul pinned to full f32 precision (never bf16 MXU passes).

    For the tiny (b, b) blocks of the chain solver the contraction is
    explicitly unrolled over the shared dimension — elementwise VPU ops —
    which both avoids the MXU precision cliff and its tiling overhead.
    """
    b = A.shape[-1]
    if b > MAX_UNROLL:
        return jnp.matmul(A, B, precision="highest")
    # (..., m, b) @ (..., b, n) -> sum_k A[..., :, k] * B[..., k, :]
    out = A[..., :, 0, None] * B[..., None, 0, :]
    for k in range(1, b):
        out = out + A[..., :, k, None] * B[..., None, k, :]
    return out
