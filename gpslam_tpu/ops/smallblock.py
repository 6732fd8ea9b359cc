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
    """Lower Cholesky of SPD (..., b, b): unrolled Cholesky-Crout for
    b <= MAX_UNROLL, BLOCKED recursion above it (16-wide panels: unrolled
    panel factor + triangular solve + matmul_hp Schur update). The blocked
    path exists because jnp.linalg.cholesky lowers to a loop-heavy LAPACK
    scheme on TPU — measured ~2 ms per batched (C, 48, 48) call vs ~0.1 ms
    blocked — and the supernodal streams issue one such call per chunk."""
    b = A.shape[-1]
    if b > MAX_UNROLL:
        b1 = MAX_UNROLL
        A11 = A[..., :b1, :b1]
        A21 = A[..., b1:, :b1]
        A22 = A[..., b1:, b1:]
        L11 = cholesky(A11)
        # L21 = A21 L11^{-T}
        L21 = jnp.swapaxes(
            solve_lower(L11, jnp.swapaxes(A21, -1, -2)), -1, -2
        )
        S = A22 - matmul_hp(L21, jnp.swapaxes(L21, -1, -2))
        L22 = cholesky(S)
        top = jnp.concatenate(
            [L11, jnp.zeros_like(jnp.swapaxes(A21, -1, -2))], axis=-1
        )
        bot = jnp.concatenate([L21, L22], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
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
    """X with L X = B; L (..., b, b) lower, B (..., b, k). Unrolled for
    b <= MAX_UNROLL, blocked forward substitution above (see cholesky)."""
    b = L.shape[-2]
    if b > MAX_UNROLL:
        b1 = MAX_UNROLL
        X1 = solve_lower(L[..., :b1, :b1], B[..., :b1, :])
        B2 = B[..., b1:, :] - matmul_hp(L[..., b1:, :b1], X1)
        X2 = solve_lower(L[..., b1:, b1:], B2)
        return jnp.concatenate([X1, X2], axis=-2)
    X = [None] * b
    for i in range(b):
        s = B[..., i, :]
        for j in range(i):
            s = s - L[..., i, j, None] * X[j]
        X[i] = s / L[..., i, i, None]
    return jnp.stack(X, -2)


def solve_upper_from_lower(L, B):
    """X with L^T X = B (upper solve using the lower factor). Unrolled for
    b <= MAX_UNROLL, blocked backward substitution above (see cholesky)."""
    b = L.shape[-2]
    if b > MAX_UNROLL:
        b1 = MAX_UNROLL
        X2 = solve_upper_from_lower(L[..., b1:, b1:], B[..., b1:, :])
        # (L^T)[top, bottom] = L21^T
        B1 = B[..., :b1, :] - matmul_hp(
            jnp.swapaxes(L[..., b1:, :b1], -1, -2), X2
        )
        X1 = solve_upper_from_lower(L[..., :b1, :b1], B1)
        return jnp.concatenate([X1, X2], axis=-2)
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
