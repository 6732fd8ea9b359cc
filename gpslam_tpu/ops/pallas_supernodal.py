"""Pallas gather-GEMM kernels for the supernodal level schedules — the
"supernodal block-sparse Cholesky expressed as batched dense Pallas blocks"
of BASELINE.json, in the form the hardware actually wants.

Why this exists: on the tunnel-attached v5e, EVERY XLA gather/scatter op
costs ~0.4 ms regardless of row count (measured; size-independent from 18 MB
to 370 MB operands). The streamed factorization issues ~3-6 such ops per
chunk step, so a 10k-state graph's 346-step factorization stream spent ~1 s
in fixed gather/scatter latency for ~8 ms of actual traffic. These kernels
replace each level's gather -> batched-GEMM -> scatter chain with ONE
`pallas_call`: a 1-D grid over the level's (dst, src1, src2) triples whose
BlockSpec index_maps read the scalar-prefetched index arrays, so the
pipeline hardware double-buffers the 9 KB block DMAs while the MXU runs.
Measured: 28k triples of (48, 48) panels in 37 ms = 1.3 us/triple, ~25x the
XLA stream path.

Accumulation uses the standard Pallas revisiting idiom: triples are sorted
by destination, the output index_map revisits the same block for a run of
equal dsts, the kernel accumulates into a VMEM scratch and writes it out
every step — only the final value of a run is flushed to HBM. The
destination array is input/output aliased, so untouched blocks pass through
and runs initialize from the current block value.

Triangular solves avoid in-kernel scalar recurrences entirely: after each
level's batched Cholesky, the panel inverse L_jj^{-1} is computed once
(blocked XLA, ops/smallblock.py) and stored in a side table; TRSM and the
diagonal solve steps then become gather-GEMM kernels against that table
(X = A L^{-T}, y = L^{-1} y). Solve right-hand sides ride as thin (B, 8)
panels (column 0 real) so every block respects the (8, 128) f32 tiling.
[f32 only; used by SupernodalSolver mode="pallas".]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# triple-count buckets: levels pad their schedules up to the next bucket so
# distinct kernel shapes (=> Mosaic compiles) stay bounded
_BUCKETS = (64, 256, 1024, 4096, 16384, 65536, 262144)

_DIMS = {
    "mm_bt": ((1,), (1,)),  # A @ B^T      (B,B)x(B,B) -> (B,B)
    "mm": ((1,), (0,)),     # A @ Y        (B,B)x(B,K) -> (B,K)
    "mm_t": ((0,), (0,)),   # A^T @ Y      (B,B)x(B,K) -> (B,K)
}


def bucket(n: int) -> int:
    for c in _BUCKETS:
        if n <= c:
            return c
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


@functools.lru_cache(maxsize=None)
def _gemm_call(NB, ND, B, K, T, op, combine, interpret):
    """One gather-GEMM pallas_call over T index triples.

    out[d[i]] (-= | += | =) contract(A[a[i]], Bb[b[i]]) per _DIMS[op].
    A is (NA, B, B); Bb and the aliased destination array are (ND, B, K)
    for 'mm'/'mm_t' (K = rhs panel width) or (ND, B, B) for 'mm_bt'.
    combine 'acc_sub'/'acc_add' need d sorted (equal-dst runs accumulate in
    VMEM and flush once); 'set' needs unique real dsts. 'acc_add' is the
    sharded-stream variant: partial frontal deltas ACCUMULATE (the psum
    subtracts them later), vs the single-device left-looking 'acc_sub'.
    """
    dims = _DIMS[op]
    rblk = (1, B, B) if op == "mm_bt" else (1, B, K)

    def kernel(a_idx, b_idx, d_idx, a_ref, b_ref, dstin_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        if combine in ("acc_sub", "acc_add"):
            @pl.when(jnp.logical_or(
                i == 0, d_idx[i] != d_idx[jnp.maximum(i - 1, 0)]))
            def _():
                acc_ref[...] = dstin_ref[0]
        u = jax.lax.dot_general(
            a_ref[0], b_ref[0], (dims, ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if combine == "acc_sub":
            acc_ref[...] -= u
            o_ref[0] = acc_ref[...]
        elif combine == "acc_add":
            acc_ref[...] += u
            o_ref[0] = acc_ref[...]
        else:
            o_ref[0] = u

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, B), lambda i, ai, bi, di: (ai[i], 0, 0)),
            pl.BlockSpec(rblk, lambda i, ai, bi, di: (bi[i], 0, 0)),
            pl.BlockSpec(rblk, lambda i, ai, bi, di: (di[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(rblk, lambda i, ai, bi, di: (di[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM(rblk[1:], jnp.float32)],
    )
    out_shape = jax.ShapeDtypeStruct((ND,) + rblk[1:], jnp.float32)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={5: 0}, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Factorization MEGA-KERNEL: the ENTIRE supernodal numeric factorization as
# ONE pallas_call. Motivation (measured, BASELINE.md round 4): on the
# tunnel-attached v5e runtime every pallas_call launch costs ~2.5 ms and
# every XLA gather/scatter-class op ~0.4 ms, so a ~120-step factorization
# stream is dispatch-bound at ~380 ms regardless of FLOPs. This kernel runs
# the whole level schedule as a single sequential grid (TPU grids execute in
# order) over per-step opcodes:
#
#   UPD  (0)  ext[dst] -= ext[s1] @ ext[s2]^T   (dst-sorted VMEM acc runs)
#   CHOL (1)  ext[dst] = chol(ext[dst]);  Linv[dst] = L^{-1}
#             (in-kernel unrolled column recurrence + row-recurrence
#              triangular inverse — ~10 B vector ops on the (B, B) tile)
#   TRSM (2)  ext[dst] = ext[dst] @ Linv[s1]^T
#   NOP  (3)  ext[T] = ext[T] (copy-through on the trash block)
#
# Correctness under the software pipeline: input blocks for step i+1 are
# DMA'd while step i computes, so a read must trail the write of the same
# block by at least the pipeline depth. The host scheduler (supernodal.
# _get_mega_sched) orders each level [upds | NOPs | chols | NOPs | trsms |
# NOPs] — within a phase no block is both written and read — and the NOP
# spacers (_MEGA_PAD >= pipeline depth) separate cross-phase dependencies.
# Linv row n holds the identity; non-chol steps rewrite it with eye so pad
# lanes stay exact no-ops.
# ---------------------------------------------------------------------------

_MEGA_PAD = 8  # NOP spacer length between dependent phases


def _chol_inv_tile(M, B):
    """Unrolled Cholesky + lower-triangular inverse of a (B, B) f32 tile.

    TPU-friendly: 2-D iota masks only, no transposes. Column j is pulled by
    a masked lane-reduction and its TRANSPOSE comes for free from the
    symmetry of the (maintained-symmetric) trailing submatrix — the outer
    product is a broadcast multiply of a (B, 1) column by a (1, B) row.
    The inverse is a row recurrence: X[i, :] = (e_i - L[i, :i] X) / L[i, i],
    one (1, B) x (B, B) dot per row. ~12*B vector ops total."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    eyeB = jnp.where(rows == cols, 1.0, 0.0).astype(jnp.float32)
    L = jnp.zeros((B, B), jnp.float32)
    for j in range(B):
        d = jax.lax.rsqrt(
            jnp.sum(jnp.where((rows == j) & (cols == j), M, 0.0)))
        col = jnp.sum(jnp.where(cols == j, M, 0.0), axis=1,
                      keepdims=True) * d          # (B, 1)
        row = jnp.sum(jnp.where(rows == j, M, 0.0), axis=0,
                      keepdims=True) * d          # (1, B) == col^T (symmetry)
        col_lo = jnp.where(rows[:, :1] >= j, col, 0.0)
        L = jnp.where(cols == j, col_lo, L)
        M = M - jnp.where((cols > j) & (rows > j), col * row, 0.0)
    X = jnp.zeros((B, B), jnp.float32)
    for i in range(B):
        li = jnp.sum(jnp.where((rows == i) & (cols < i), L, 0.0),
                     axis=0, keepdims=True)       # (1, B): L[i, :i]
        acc = jax.lax.dot_general(
            li, X, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                          # (1, B)
        dii = jnp.sum(jnp.where((rows == i) & (cols == i), L, 0.0))
        ei = jnp.where((rows[:1, :] == 0) & (cols[:1, :] == i), 1.0, 0.0)
        xi = (ei - acc) / dii
        X = jnp.where(rows == i, xi, X)
    return L, X


@functools.lru_cache(maxsize=None)
def _mega_call(NE, NL, B, S, interpret):
    """One factorization mega-kernel instance: NE ext blocks (incl. the Z/T
    pad slots), NL = n + 1 Linv rows, B panel dim, S steps."""

    def kernel(op_idx, d_idx, s1_idx, s2_idx, li_idx, lo_idx,
               a1_ref, a2_ref, din_ref, lin_ref, o_ref, lo_ref, acc_ref):
        i = pl.program_id(0)
        op = op_idx[i]
        eyeB = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1),
            1.0, 0.0).astype(jnp.float32)

        @pl.when(op == 0)  # UPD
        def _():
            @pl.when(jnp.logical_or(
                i == 0, d_idx[i] != d_idx[jnp.maximum(i - 1, 0)]))
            def _():
                acc_ref[...] = din_ref[0]
            acc_ref[...] -= jax.lax.dot_general(
                a1_ref[0], a2_ref[0], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = acc_ref[...]
            lo_ref[0] = eyeB

        @pl.when(op == 1)  # CHOL + inverse
        def _():
            L, X = _chol_inv_tile(din_ref[0], B)
            o_ref[0] = L
            lo_ref[0] = X

        @pl.when(op == 2)  # TRSM against the inverse table
        def _():
            o_ref[0] = jax.lax.dot_general(
                din_ref[0], lin_ref[0], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            lo_ref[0] = eyeB

        @pl.when(op == 3)  # NOP spacer
        def _():
            o_ref[0] = din_ref[0]
            lo_ref[0] = eyeB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, B, B), lambda i, op, d, s1, s2, li, lo:
                         (s1[i], 0, 0)),
            pl.BlockSpec((1, B, B), lambda i, op, d, s1, s2, li, lo:
                         (s2[i], 0, 0)),
            pl.BlockSpec((1, B, B), lambda i, op, d, s1, s2, li, lo:
                         (d[i], 0, 0)),
            pl.BlockSpec((1, B, B), lambda i, op, d, s1, s2, li, lo:
                         (li[i], 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, B, B), lambda i, op, d, s1, s2, li, lo:
                         (d[i], 0, 0)),
            pl.BlockSpec((1, B, B), lambda i, op, d, s1, s2, li, lo:
                         (lo[i], 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((B, B), jnp.float32)],
    )
    out_shape = (
        jax.ShapeDtypeStruct((NE, B, B), jnp.float32),
        jax.ShapeDtypeStruct((NL, B, B), jnp.float32),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={8: 0, 9: 1}, interpret=interpret,
    )


def factorize_mega(ext, Linv, sched, interpret: bool = False):
    """Run the whole factorization stream in ONE launch.

    EXPERIMENTAL — currently produces stale reads on device (see the
    SupernodalSolver._factorize_mega status note: BlockSpec-pipelined input
    fetches do not observe in-grid writes; needs a manual-DMA rewrite).
    Kept as groundwork; no production caller invokes it.

    ext (NE, B, B) incl. Z/T pad slots; Linv (n+1, B, B) with identity at
    row n; sched = (op, dst, s1, s2, linv_in, linv_out) int32 arrays of one
    common length S (host-built, NOP-padded). Returns (ext, Linv)."""
    op, d, s1, s2, li, lo = (jnp.asarray(x) for x in sched)
    call = _mega_call(ext.shape[0], Linv.shape[0], ext.shape[-1],
                      int(op.shape[0]), interpret)
    # operands: 6 scalar-prefetch + [a1, a2, dstin, linv_in]; dstin (idx 8)
    # and linv_in (idx 9) are input/output-aliased to the two outputs
    return call(op, d, s1, s2, li, lo, ext, ext, ext, Linv)


def gather_gemm(A, b_arr, dst_arr, a_idx, b_idx, d_idx, *, op: str,
                combine: str, interpret: bool = False):
    """dst_arr[d_idx[i]] (-= | += | =) contract(A[a_idx[i]], b_arr[b_idx[i]]).

    Index arrays are host numpy (static schedules) OR runtime device arrays
    (device-indexed sharded schedules — scalar-prefetch operands are regular
    pallas_call arguments, fetched before the grid launches), already padded
    to a static length with trash rows; d_idx must be sorted for
    'acc_sub'/'acc_add'. Returns the updated dst_arr (input/output
    aliased)."""
    K = b_arr.shape[-1]
    call = _gemm_call(b_arr.shape[0], dst_arr.shape[0], A.shape[-1], K,
                      len(d_idx), op, combine, interpret)
    return call(jnp.asarray(a_idx), jnp.asarray(b_idx), jnp.asarray(d_idx),
                A, b_arr, dst_arr)
