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
