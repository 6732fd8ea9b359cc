"""Fused Pallas BCR level kernels — the flagship chain-solver kernels
(BASELINE.json "supernodal block-sparse Cholesky expressed as batched dense
Pallas blocks"; SURVEY.md §7 M4, pallas_guide.md).

Block cyclic reduction's per-level work is "for every odd block: factorize
D_odd, solve a handful of small right-hand sides, form five products". The
XLA path (ops/tridiag.py) materializes each intermediate (S1, S2, the
stacked solve, the shifted contributions) in HBM — measured ~25x off the
traffic bound at 1M states. These kernels fuse one whole level into two
passes:

  REDUCE kernel:  d_odd, u_eo, u_oe, r_odd  ->  L, P1, P2, P3, q1, q2
     where A1 = D^-1 U_eo^T, A2 = D^-1 U_oe, z = D^-1 r_odd and
     P1 = U_eo A1, P2 = U_eo A2 (= -U_red), P3 = U_oe^T A2,
     q1 = U_eo z, q2 = U_oe^T z.
     (The cheap shifted subtractions D_red = D_even - P1 - shift(P3) etc.
     stay in XLA — pure elementwise, fused for free.)

  BACKSUB kernel: L, u_eo, u_oe, r_odd, x_even, x_next -> x_odd
     x_odd = (L L^T)^-1 (r_odd - U_eo^T x_even - U_oe x_next).

PLANE-MAJOR layout: every block entry (i,j) is a PLANE over the chain
dimension; arrays are (b*b, M, 128) with N = M*128 chain elements, so each
in-kernel row access yields a full (TM, 128) tile = fully-packed (8,128)
VPU registers (a (1, N) row layout would idle 7/8 of the VPU sublanes).
Every one of the ~b^3 small-block recurrence steps is then one full-width
VPU op; the whole level runs out of VMEM with one HBM read of the inputs
and one write of the outputs.

Equivalence vs the XLA path is tested in interpret mode (§5.2 sanitizer)
and on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import smallblock as sb

LANE = 128


def _chol_rows(b, a):
    """Unrolled Cholesky-Crout on row planes a[i*b+j] -> L[i][j] (i >= j)."""
    L = [[None] * b for _ in range(b)]
    for j in range(b):
        s = a[j * b + j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, b):
            s = a[i * b + j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv
    return L


def _chol_solve_col(b, L, rhs):
    """x = (L L^T)^-1 rhs for one column rhs (list of b planes)."""
    y = [None] * b
    for i in range(b):
        s = rhs[i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s / L[i][i]
    x = [None] * b
    for i in reversed(range(b)):
        s = y[i]
        for t in range(i + 1, b):
            s = s - L[t][i] * x[t]
        x[i] = s / L[i][i]
    return x


def _reduce_kernel(b, k, d_ref, ueo_ref, uoe_ref, r_ref,
                   l_ref, p1_ref, p2_ref, p3_ref, q1_ref, q2_ref):
    d = [d_ref[i] for i in range(b * b)]
    ueo = [ueo_ref[i] for i in range(b * b)]
    uoe = [uoe_ref[i] for i in range(b * b)]
    r = [r_ref[i] for i in range(b * k)]

    L = _chol_rows(b, d)
    zero = jnp.zeros_like(d[0])
    for i in range(b):
        for j in range(b):
            l_ref[i * b + j] = L[i][j] if i >= j else zero

    # A1[:, c] = D^-1 (U_eo^T)[:, c];  (U_eo^T)[i, c] = U_eo[c, i]
    A1 = [_chol_solve_col(b, L, [ueo[c * b + i] for i in range(b)])
          for c in range(b)]  # A1[c][i] = A1[i, c]
    A2 = [_chol_solve_col(b, L, [uoe[i * b + c] for i in range(b)])
          for c in range(b)]
    z = [_chol_solve_col(b, L, [r[i * k + c] for i in range(b)])
         for c in range(k)]

    for i in range(b):
        for j in range(b):
            s1 = ueo[i * b + 0] * A1[j][0]
            s2 = ueo[i * b + 0] * A2[j][0]
            s3 = uoe[0 * b + i] * A2[j][0]
            for t in range(1, b):
                s1 = s1 + ueo[i * b + t] * A1[j][t]
                s2 = s2 + ueo[i * b + t] * A2[j][t]
                s3 = s3 + uoe[t * b + i] * A2[j][t]
            p1_ref[i * b + j] = s1
            p2_ref[i * b + j] = s2
            p3_ref[i * b + j] = s3
    for i in range(b):
        for c in range(k):
            s1 = ueo[i * b + 0] * z[c][0]
            s2 = uoe[0 * b + i] * z[c][0]
            for t in range(1, b):
                s1 = s1 + ueo[i * b + t] * z[c][t]
                s2 = s2 + uoe[t * b + i] * z[c][t]
            q1_ref[i * k + c] = s1
            q2_ref[i * k + c] = s2


def _backsub_kernel(b, k, l_ref, ueo_ref, uoe_ref, r_ref, xe_ref, xn_ref,
                    xo_ref):
    ueo = [ueo_ref[i] for i in range(b * b)]
    uoe = [uoe_ref[i] for i in range(b * b)]
    L = [[l_ref[i * b + j] if i >= j else None for j in range(b)]
         for i in range(b)]
    for c in range(k):
        rhs = []
        for i in range(b):
            s = r_ref[i * k + c]
            for t in range(b):
                # (U_eo^T x_even)[i] = sum_t U_eo[t, i] x_even[t]
                s = s - ueo[t * b + i] * xe_ref[t * k + c]
                s = s - uoe[i * b + t] * xn_ref[t * k + c]
            rhs.append(s)
        x = _chol_solve_col(b, L, rhs)
        for i in range(b):
            xo_ref[i * k + c] = x[i]


# --------------------------------------------------------------------------
# v3: split-kernel level pipeline for LARGE blocks (12 < b <= 24 — the WNOJ
# SE(3) b=18 jerk-model state). The monolithic v1/v2 reduce kernels hold
# every input AND output plane in VMEM at once: at b=18 that is (990 in +
# 1332 out) rows x (8, 128) f32 x double-buffering ~= 19 MB > 16 MB VMEM.
# The v3 pipeline factors the level through the panel inverse Linv = L^{-1}
# and splits the work into six kernels, each VMEM-sized:
#
#   A: D_odd -> Linv            (Cholesky + lower-triangular inverse)
#   B: C1 = U_eo Linv^T         (half-triangular contraction)
#   C: C2 = Linv U_oe
#   D1: P1 = C1 C1^T, P2 = C1 C2, q1 = C1 (Linv r)
#   D2: P3 = C2^T C2, q2 = C2^T (Linv r)
#   E (backsub): x_odd = Linv^T Linv (r - U_eo^T x_ev - U_oe x_next)
#
# identical math to v1 (P1 = U_eo D^-1 U_eo^T etc. — Dinv = Linv^T Linv);
# the shifted subtractions stay in XLA (v1-style, fused elementwise). Each
# kernel unrolls <= ~9k VPU plane ops, which Mosaic compiles in reasonable
# time; the per-level cost is 6 pallas calls instead of 2, still one HBM
# round-trip per array vs the XLA path's per-intermediate materialization.
# --------------------------------------------------------------------------


def _linv_rows(b, L):
    """Lower-triangular inverse from _chol_rows output (list-of-lists)."""
    Li = [[None] * b for _ in range(b)]
    for j in range(b):
        Li[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, b):
            s = L[i][j] * Li[j][j]
            for t in range(j + 1, i):
                s = s + L[i][t] * Li[t][j]
            Li[i][j] = -s / L[i][i]
    return Li


def _chol_inv_kernel(b, k, d_ref, linv_ref):
    d = [d_ref[i] for i in range(b * b)]
    L = _chol_rows(b, d)
    Li = _linv_rows(b, L)
    zero = jnp.zeros_like(d[0])
    for i in range(b):
        for j in range(b):
            linv_ref[i * b + j] = Li[i][j] if i >= j else zero


def _c1_kernel(b, k, ueo_ref, linv_ref, c1_ref):
    """C1 = U_eo Linv^T:  C1[i,j] = sum_{t<=j} U_eo[i,t] Linv[j,t]."""
    for i in range(b):
        for j in range(b):
            s = ueo_ref[i * b + 0] * linv_ref[j * b + 0]
            for t in range(1, j + 1):
                s = s + ueo_ref[i * b + t] * linv_ref[j * b + t]
            c1_ref[i * b + j] = s


def _c2_kernel(b, k, linv_ref, uoe_ref, c2_ref):
    """C2 = Linv U_oe:  C2[i,j] = sum_{t<=i} Linv[i,t] U_oe[t,j]."""
    for i in range(b):
        for j in range(b):
            s = linv_ref[i * b + 0] * uoe_ref[0 * b + j]
            for t in range(1, i + 1):
                s = s + linv_ref[i * b + t] * uoe_ref[t * b + j]
            c2_ref[i * b + j] = s


def _z0_rows(b, k, linv_ref, r_ref):
    """z0 = Linv r (per rhs column)."""
    z0 = [[None] * b for _ in range(k)]
    for c in range(k):
        for i in range(b):
            s = linv_ref[i * b + 0] * r_ref[0 * k + c]
            for t in range(1, i + 1):
                s = s + linv_ref[i * b + t] * r_ref[t * k + c]
            z0[c][i] = s
    return z0


def _d1_kernel(b, k, c1_ref, c2_ref, linv_ref, r_ref,
               p1_ref, p2_ref, q1_ref):
    """P1 = C1 C1^T (symmetric), P2 = C1 C2, q1 = C1 z0."""
    for i in range(b):
        for j in range(i + 1):
            s = c1_ref[i * b + 0] * c1_ref[j * b + 0]
            for t in range(1, b):
                s = s + c1_ref[i * b + t] * c1_ref[j * b + t]
            p1_ref[i * b + j] = s
            if i != j:
                p1_ref[j * b + i] = s
    for i in range(b):
        for j in range(b):
            s = c1_ref[i * b + 0] * c2_ref[0 * b + j]
            for t in range(1, b):
                s = s + c1_ref[i * b + t] * c2_ref[t * b + j]
            p2_ref[i * b + j] = s
    z0 = _z0_rows(b, k, linv_ref, r_ref)
    for i in range(b):
        for c in range(k):
            s = c1_ref[i * b + 0] * z0[c][0]
            for t in range(1, b):
                s = s + c1_ref[i * b + t] * z0[c][t]
            q1_ref[i * k + c] = s


def _d2_kernel(b, k, c2_ref, linv_ref, r_ref, p3_ref, q2_ref):
    """P3 = C2^T C2 (symmetric), q2 = C2^T z0."""
    for i in range(b):
        for j in range(i + 1):
            s = c2_ref[0 * b + i] * c2_ref[0 * b + j]
            for t in range(1, b):
                s = s + c2_ref[t * b + i] * c2_ref[t * b + j]
            p3_ref[i * b + j] = s
            if i != j:
                p3_ref[j * b + i] = s
    z0 = _z0_rows(b, k, linv_ref, r_ref)
    for i in range(b):
        for c in range(k):
            s = c2_ref[0 * b + i] * z0[c][0]
            for t in range(1, b):
                s = s + c2_ref[t * b + i] * z0[c][t]
            q2_ref[i * k + c] = s


def _backsub_v3_kernel(b, k, linv_ref, ueo_ref, uoe_ref, r_ref, xe_ref,
                       xn_ref, xo_ref):
    """x_odd = Linv^T Linv (r - U_eo^T x_ev - U_oe x_next)."""
    for c in range(k):
        rhs = []
        for i in range(b):
            s = r_ref[i * k + c]
            for t in range(b):
                s = s - ueo_ref[t * b + i] * xe_ref[t * k + c]
                s = s - uoe_ref[i * b + t] * xn_ref[t * k + c]
            rhs.append(s)
        z = [None] * b
        for i in range(b):
            s = linv_ref[i * b + 0] * rhs[0]
            for t in range(1, i + 1):
                s = s + linv_ref[i * b + t] * rhs[t]
            z[i] = s
        for i in range(b):
            s = linv_ref[i * b + i] * z[i]
            for t in range(i + 1, b):
                s = s + linv_ref[t * b + i] * z[t]
            xo_ref[i * k + c] = s


def _row_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _col_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _shift1_tile(x, carry):
    """Shift a (TM, 128) plane tile by ONE chain element to the right
    (chain index = m*128 + l): y[m,l] = x at chain index m*128+l-1, with
    `carry` (scalar: the previous tile's last element) entering at [0,0]."""
    a = pltpu.roll(x, 1, axis=1)          # a[m, 0] = x[m, 127]
    bshift = pltpu.roll(a, 1, axis=0)     # b[m, 0] = x[m-1, 127]
    first = jnp.logical_and(_row_ids(x.shape) == 0, _col_ids(x.shape) == 0)
    col0 = jnp.where(first, carry, bshift)
    return jnp.where(_col_ids(x.shape) == 0, col0, a)


def _shiftm1_tile(x, carry):
    """Shift LEFT by one chain element: y[m,l] = x at m*128+l+1; `carry`
    (the NEXT tile's first element) enters at [TM-1, 127]."""
    TM = x.shape[0]
    a = pltpu.roll(x, LANE - 1, axis=1)   # == shift -1: a[m, 127] = x[m, 0]
    bshift = pltpu.roll(a, TM - 1, axis=0)  # b[m, 127] = x[m+1, 0]
    last = jnp.logical_and(_row_ids(x.shape) == TM - 1,
                           _col_ids(x.shape) == 127)
    coln = jnp.where(last, carry, bshift)
    return jnp.where(_col_ids(x.shape) == 127, coln, a)


def _reduce_kernel_v2(b, k, d_od_ref, ueo_ref, uoe_ref, r_od_ref,
                      d_ev_ref, r_ev_ref,
                      l_ref, dred_ref, ured_ref, rred_ref, carry_ref):
    """Fused reduce INCLUDING the shifted subtractions: outputs the reduced
    level directly. carry_ref (SMEM, bb+bk) holds the previous tile's last
    P3 / q2 chain element (sequential TPU grid)."""
    bb, bk = b * b, b * k
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for rr in range(bb + bk):
            carry_ref[rr] = jnp.zeros((), d_od_ref.dtype)

    d = [d_od_ref[i] for i in range(bb)]
    ueo = [ueo_ref[i] for i in range(bb)]
    uoe = [uoe_ref[i] for i in range(bb)]
    r = [r_od_ref[i] for i in range(bk)]

    L = _chol_rows(b, d)
    zero = jnp.zeros_like(d[0])
    for i in range(b):
        for j in range(b):
            l_ref[i * b + j] = L[i][j] if i >= j else zero

    A1 = [_chol_solve_col(b, L, [ueo[c * b + i] for i in range(b)])
          for c in range(b)]
    A2 = [_chol_solve_col(b, L, [uoe[i * b + c] for i in range(b)])
          for c in range(b)]
    z = [_chol_solve_col(b, L, [r[i * k + c] for i in range(b)])
         for c in range(k)]

    carry_in = [carry_ref[rr] for rr in range(bb + bk)]
    for i in range(b):
        for j in range(b):
            s1 = ueo[i * b + 0] * A1[j][0]
            s2 = ueo[i * b + 0] * A2[j][0]
            s3 = uoe[0 * b + i] * A2[j][0]
            for t in range(1, b):
                s1 = s1 + ueo[i * b + t] * A1[j][t]
                s2 = s2 + ueo[i * b + t] * A2[j][t]
                s3 = s3 + uoe[t * b + i] * A2[j][t]
            rr = i * b + j
            # D_red = D_even - P1 - shift(P3);  U_red = -P2
            dred_ref[rr] = (d_ev_ref[rr] - s1
                            - _shift1_tile(s3, carry_in[rr]))
            ured_ref[rr] = -s2
            carry_ref[rr] = s3[s3.shape[0] - 1, LANE - 1]
    for i in range(b):
        for c in range(k):
            s1 = ueo[i * b + 0] * z[c][0]
            s2 = uoe[0 * b + i] * z[c][0]
            for t in range(1, b):
                s1 = s1 + ueo[i * b + t] * z[c][t]
                s2 = s2 + uoe[t * b + i] * z[c][t]
            rr = i * k + c
            rred_ref[rr] = (r_ev_ref[rr] - s1
                            - _shift1_tile(s2, carry_in[bb + rr]))
            carry_ref[bb + rr] = s2[s2.shape[0] - 1, LANE - 1]


def _backsub_kernel_v2(b, k, l_ref, ueo_ref, uoe_ref, r_ref, xe_ref,
                       xo_ref, carry_ref):
    """Backsub with the x_next shift folded in; grid runs REVERSED over
    tiles so carry_ref (SMEM, bk) holds the chain-NEXT tile's first x_even
    element."""
    bk = b * k
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for rr in range(bk):
            carry_ref[rr] = jnp.zeros((), l_ref.dtype)

    ueo = [ueo_ref[i] for i in range(b * b)]
    uoe = [uoe_ref[i] for i in range(b * b)]
    L = [[l_ref[i * b + j] if i >= j else None for j in range(b)]
         for i in range(b)]
    xe = [xe_ref[rr] for rr in range(bk)]
    xn = [_shiftm1_tile(xe[rr], carry_ref[rr]) for rr in range(bk)]
    for rr in range(bk):
        carry_ref[rr] = xe[rr][0, 0]
    for c in range(k):
        rhs = []
        for i in range(b):
            s = r_ref[i * k + c]
            for t in range(b):
                s = s - ueo[t * b + i] * xe[t * k + c]
                s = s - uoe[i * b + t] * xn[t * k + c]
            rhs.append(s)
        x = _chol_solve_col(b, L, rhs)
        for i in range(b):
            xo_ref[i * k + c] = x[i]


def _call_level(kernel, b, k, ins, out_rows, tile_m, interpret,
                carry_rows: int = 0, reverse: bool = False):
    """Run a level kernel over (rows, M, 128) plane arrays.

    carry_rows > 0 allocates an SMEM scratch carrying per-row scalars
    between sequential grid steps (TPU grids execute in order); reverse
    walks the tiles back-to-front (for lookahead carries)."""
    M = ins[0].shape[1]
    dtype = ins[0].dtype
    n_tiles = M // tile_m
    grid = (n_tiles,)

    if reverse:
        def imap(i):
            return (0, n_tiles - 1 - i, 0)
    else:
        def imap(i):
            return (0, i, 0)

    def spec(rows):
        return pl.BlockSpec((rows, tile_m, LANE), imap,
                            memory_space=pltpu.VMEM)

    scratch = [pltpu.SMEM((carry_rows,), dtype)] if carry_rows else []
    return pl.pallas_call(
        functools.partial(kernel, b, k),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, M, LANE), dtype) for rows in out_rows
        ),
        grid=grid,
        in_specs=[spec(x.shape[0]) for x in ins],
        out_specs=tuple(spec(rows) for rows in out_rows),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)


def _shift_right(P):
    """(rows, M, 128) planes: shift by ONE chain element (flattened lanes)."""
    rows, M, _ = P.shape
    flat = P.reshape(rows, M * LANE)
    flat = jnp.pad(flat[:, :-1], ((0, 0), (1, 0)))
    return flat.reshape(rows, M, LANE)


def _shift_left(P):
    rows, M, _ = P.shape
    flat = P.reshape(rows, M * LANE)
    flat = jnp.pad(flat[:, 1:], ((0, 0), (0, 1)))
    return flat.reshape(rows, M, LANE)


_UNSHUFFLE = None


def _unshuffle_matrix(dtype):
    """128x128 0/1 permutation: lane l -> l//2 (+64 if odd). Applying it by
    matmul is BIT-EXACT (each output is one input times 1.0; validated) and
    ~3x faster on the MXU than XLA's strided-slice lowering of the same
    de-interleave (measured 29 -> 83 GB/s on v5e)."""
    global _UNSHUFFLE
    if _UNSHUFFLE is None:
        import numpy as np

        P = np.zeros((LANE, LANE), np.float32)
        for l in range(LANE):
            P[l, (l // 2) + (LANE // 2 if l % 2 else 0)] = 1.0
        _UNSHUFFLE = P
    return jnp.asarray(_UNSHUFFLE, dtype)


def _deinterleave(P):
    """(rows, M, 128) -> even/odd chain elements, each (rows, M/2, 128)."""
    rows, M, _ = P.shape
    Pm = _unshuffle_matrix(P.dtype)
    y = jnp.einsum("rml,lk->rmk", P, Pm, precision="highest")
    ev = y[:, :, : LANE // 2].reshape(rows, M // 2, LANE)
    od = y[:, :, LANE // 2 :].reshape(rows, M // 2, LANE)
    return ev, od


def _interleave(ev, od):
    rows, M2, _ = ev.shape
    y = jnp.concatenate(
        [ev.reshape(rows, M2 * 2, LANE // 2),
         od.reshape(rows, M2 * 2, LANE // 2)], axis=-1,
    )
    Pm = _unshuffle_matrix(ev.dtype)
    return jnp.einsum("rmk,lk->rml", y, Pm, precision="highest")


def bcr_solve_fused(D, U, r, min_pallas_n: int = 8192, tile_m: int = 16,
                    interpret: bool = False, version: int = 2):
    """Block-tridiagonal solve with fused Pallas level kernels.

    D (N,b,b) SPD, U (N,b,b; U[N-1]=0), r (N,b,k) -> x (N,b,k).
    Levels with at least min_pallas_n odd blocks run the fused kernels;
    smaller levels (and the recursion base) use the XLA unrolled path.
    min_pallas_n must be >= 64*tile_m so plane shapes stay tile-aligned.

    Supports b <= 12 via the fused v1/v2 kernels — covering SE(3) pose+twist
    chain states (b = 12, the 3D workloads of BASELINE configs 4/5). b in
    (8, 12] drops to tile_m=8 (the f32 sublane minimum): the plane working
    set is b*b rows per array and VMEM double-buffering overflows at
    tile_m=16. b in (12, 24] — the WNOJ SE(3) b=18 jerk-model state — routes
    to the SPLIT-kernel v3 pipeline (six VMEM-sized kernels per level
    through the panel inverse; see the v3 block comment), gated on the
    per-kernel VMEM estimate; beyond that the XLA path takes over.

    version=2 (default) folds the neighbor-shifted subtractions into the
    kernels via sequential-grid SMEM carries (one kernel per level each
    way); version=1 keeps the shift/subtract glue in XLA.
    """
    from . import tridiag

    N, b, _ = D.shape
    k = r.shape[-1]
    dtype = D.dtype
    if N < 2 * min_pallas_n or dtype != jnp.float32 or b > 24:
        return tridiag.bcr_solve(D, U, r)
    if 12 < b <= 24:
        # v3 VMEM estimate — the worst kernel is D1 (5*b*b + 2*b*k rows)
        # for narrow rhs, but the backsub kernel (3*b*b + 4*b*k rows)
        # overtakes it when k > b (ADVICE r4); fall back to XLA when the
        # larger of the two pushes past the ~16 MB budget
        rows_d1 = max(5 * b * b + 2 * b * k, 3 * b * b + 4 * b * k)
        if rows_d1 * 8 * LANE * 4 * 2 > 15 * 2**20:
            return tridiag.bcr_solve(D, U, r)
        version = 3
    if b > 8:
        tile_m = min(tile_m, 8)

    m = 1 << (N - 1).bit_length()
    if m != N:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=dtype), (m - N, b, b))
        D = jnp.concatenate([D, eye], 0)
        U = jnp.concatenate([U, jnp.zeros((m - N, b, b), dtype)], 0)
        r = jnp.concatenate([r, jnp.zeros((m - N, b, k), dtype)], 0)

    # to plane-major (rows, M, 128)
    Dp = D.reshape(m, b * b).T.reshape(b * b, m // LANE, LANE)
    Up = U.reshape(m, b * b).T.reshape(b * b, m // LANE, LANE)
    rp = r.reshape(m, b * k).T.reshape(b * k, m // LANE, LANE)

    xp = _bcr_planes(Dp, Up, rp, b, k, min_pallas_n, tile_m, interpret,
                     version)
    x = xp.reshape(b * k, m).T.reshape(m, b, k)
    return x[:N]


def _bcr_planes(Dp, Up, rp, b, k, min_n, tile_m, interpret, version):
    from . import tridiag

    n = Dp.shape[1] * LANE
    n2 = n // 2
    if n2 < max(min_n, 2 * tile_m * LANE):
        # fall back to the XLA blocked path for the small deep levels
        D = Dp.reshape(b * b, n).T.reshape(n, b, b)
        U = Up.reshape(b * b, n).T.reshape(n, b, b)
        r = rp.reshape(b * k, n).T.reshape(n, b, k)
        x = tridiag.bcr_solve(D, U, r)
        return x.reshape(n, b * k).T.reshape(b * k, n // LANE, LANE)

    bb, bk = b * b, b * k
    D_ev, D_od = _deinterleave(Dp)
    U_eo, U_oe = _deinterleave(Up)
    r_ev, r_od = _deinterleave(rp)

    if version == 3:
        Linv = _call_level(_chol_inv_kernel, b, k, [D_od], [bb],
                           tile_m, interpret)[0]
        C1 = _call_level(_c1_kernel, b, k, [U_eo, Linv], [bb],
                         tile_m, interpret)[0]
        C2 = _call_level(_c2_kernel, b, k, [Linv, U_oe], [bb],
                         tile_m, interpret)[0]
        P1, P2, q1 = _call_level(_d1_kernel, b, k, [C1, C2, Linv, r_od],
                                 [bb, bb, bk], tile_m, interpret)
        P3, q2 = _call_level(_d2_kernel, b, k, [C2, Linv, r_od],
                             [bb, bk], tile_m, interpret)
        D_red = D_ev - P1 - _shift_right(P3)
        U_red = -P2
        r_red = r_ev - q1 - _shift_right(q2)
        x_ev = _bcr_planes(D_red, U_red, r_red, b, k, min_n, tile_m,
                           interpret, version)
        x_nx = _shift_left(x_ev)
        (x_od,) = _call_level(
            _backsub_v3_kernel, b, k, [Linv, U_eo, U_oe, r_od, x_ev, x_nx],
            [bk], tile_m, interpret,
        )
        return _interleave(x_ev, x_od)

    if version >= 2:
        L, D_red, U_red, r_red = _call_level(
            _reduce_kernel_v2, b, k,
            [D_od, U_eo, U_oe, r_od, D_ev, r_ev],
            [bb, bb, bb, bk], tile_m, interpret, carry_rows=bb + bk,
        )
    else:
        L, P1, P2, P3, q1, q2 = _call_level(
            _reduce_kernel, b, k, [D_od, U_eo, U_oe, r_od],
            [bb, bb, bb, bb, bk, bk], tile_m, interpret,
        )
        D_red = D_ev - P1 - _shift_right(P3)
        U_red = -P2
        r_red = r_ev - q1 - _shift_right(q2)

    x_ev = _bcr_planes(D_red, U_red, r_red, b, k, min_n, tile_m, interpret,
                       version)

    if version >= 2:
        (x_od,) = _call_level(
            _backsub_kernel_v2, b, k, [L, U_eo, U_oe, r_od, x_ev],
            [bk], tile_m, interpret, carry_rows=bk, reverse=True,
        )
    else:
        x_nx = _shift_left(x_ev)
        (x_od,) = _call_level(
            _backsub_kernel, b, k, [L, U_eo, U_oe, r_od, x_ev, x_nx],
            [bk], tile_m, interpret,
        )
    return _interleave(x_ev, x_od)
