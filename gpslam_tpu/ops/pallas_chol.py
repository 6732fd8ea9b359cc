"""Pallas TPU kernel: fused batched small-block Cholesky solve.

The BCR chain solver's inner op is "solve A X = B for tens of thousands of
tiny (b, b) SPD blocks". The XLA path (ops/smallblock.py) unrolls the scalar
recurrences over (N, b, b) arrays; this kernel goes one step further the
TPU-native way (SURVEY.md §7 / pallas_guide):

  LANES-MAJOR LAYOUT: blocks are stored transposed as (b*b, N) — the chain
  dimension lives on the 128-wide lane axis, so every one of the b(b+1)/2
  Cholesky recurrence steps and the b*k triangular-solve steps is ONE
  full-width VPU vector op over 8x128 tiles, with the entire fused
  chol+forward+backward sequence running out of VMEM (one HBM read of A and
  B, one write of X — minimum possible traffic, no intermediate L in HBM).

`chol_solve_lanes` wraps the kernel with the layout transposes; equivalence
vs the XLA path is tested in interpret mode (the §5.2 sanitizer for
hand-written kernels) and on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(b: int, k: int, a_ref, b_ref, x_ref):
    """One N-tile: A rows (b*b, TN), B rows (b*k, TN) -> X rows (b*k, TN)."""
    # load A rows as (1, TN) vectors
    a = [[a_ref[i * b + j, :] for j in range(b)] for i in range(b)]
    # Cholesky-Crout, elementwise over lanes
    L = [[None] * b for _ in range(b)]
    for j in range(b):
        s = a[j][j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, b):
            s = a[i][j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv
    # forward/backward substitution for each rhs column
    for c in range(k):
        y = [None] * b
        for i in range(b):
            s = b_ref[i * k + c, :]
            for t in range(i):
                s = s - L[i][t] * y[t]
            y[i] = s / L[i][i]
        x = [None] * b
        for i in reversed(range(b)):
            s = y[i]
            for t in range(i + 1, b):
                s = s - L[t][i] * x[t]
            x[i] = s / L[i][i]
        for i in range(b):
            x_ref[i * k + c, :] = x[i]


def chol_solve_lanes(A, B, tile_n: int = 512, interpret: bool = False):
    """Solve A X = B batched: A (N, b, b) SPD, B (N, b, k) -> X (N, b, k).

    Lanes-major Pallas kernel; N is padded to a tile multiple internally.
    """
    N, b, _ = A.shape
    k = B.shape[-1]
    dtype = A.dtype
    n_pad = (N + tile_n - 1) // tile_n * tile_n
    # transpose to (b*b, N) / (b*k, N)
    At = A.reshape(N, b * b).T
    Bt = B.reshape(N, b * k).T
    if n_pad != N:
        # pad with identity blocks / zero rhs (solved trivially, discarded)
        eye = jnp.broadcast_to(
            jnp.eye(b, dtype=dtype).reshape(b * b, 1), (b * b, n_pad - N)
        )
        At = jnp.concatenate([At, eye], axis=1)
        Bt = jnp.concatenate([Bt, jnp.zeros((b * k, n_pad - N), dtype)], 1)

    out = pl.pallas_call(
        functools.partial(_kernel, b, k),
        out_shape=jax.ShapeDtypeStruct((b * k, n_pad), dtype),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((b * b, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b * k, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b * k, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, Bt)
    return out[:, :N].T.reshape(N, b, k)
