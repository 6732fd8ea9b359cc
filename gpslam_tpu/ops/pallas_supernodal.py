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
# ONE pallas_call with MANUALLY-ORCHESTRATED DMA. Motivation (measured,
# BASELINE.md round 4): on the tunnel-attached v5e runtime every pallas_call
# launch costs ~2.5 ms and every XLA gather/scatter-class op ~0.4 ms, so a
# ~120-step factorization stream is dispatch-bound at ~380 ms regardless of
# FLOPs. BlockSpec pipelines cannot express this kernel (in-grid writes are
# not visible to later pipelined input fetches — verified on device, round
# 4), so the block storage stays in HBM (memory_space=ANY) and the kernel
# itself runs one fori_loop over the schedule, double-buffering the per-step
# block DMAs (pltpu.make_async_copy + semaphores) against compute:
#
#   UPD_FIRST (0)  acc  = ext[din] - ext[a1] @ ext[a2]^T   (run start)
#   UPD_CONT  (1)  acc -=            ext[a1] @ ext[a2]^T
#                  (each step flushes acc to ext[wd]; the host points wd at
#                   the real destination on the LAST step of a dst-run and
#                   at the trash slot otherwise)
#   CHOL      (2)  ext[wd] = chol(ext[din]);  Linv[wd] = L^{-1}
#                  (in-kernel unrolled column recurrence + row-recurrence
#                   triangular inverse — _chol_inv_tile)
#   TRSM      (3)  ext[wd] = ext[din] @ Linv[li]^T
#   NOP       (4)  ext[T] = I (hazard spacer; also keeps the trash slot an
#                  identity for the downstream stream-solve pads)
#
# Per-step traffic is UNIFORM — four block loads (unused operands point at
# the zero/identity pad rows) and two block stores — so semaphore
# accounting is static. The schedule rides in HBM as (n_win, 6, W) int32
# and is itself DMA'd window-by-window into SMEM (double-buffered), so SMEM
# never holds more than 2 windows regardless of schedule length.
#
# Hazard correctness under the 1-step lookahead pipeline: the input DMAs
# for step i+1 are issued at the end of step i, AFTER step i's compute; a
# write issued at step j is confirmed complete by the slot-reuse wait at
# step j+2 (before anything at j+2 issues). Hence any read issued at step
# i+1 only races writes of steps i and i+1 of the SAME block — which the
# host scheduler excludes: phases within a level ([upds | NOPs | chols |
# NOPs | trsms | NOPs]) never read a block written in the same phase, and
# the _MEGA_PAD NOP spacers (>= 4 >> the required 3) separate cross-phase
# dependencies. Within the UPD phase, dst-sorted runs accumulate in the
# VMEM acc and only the run-end step stores to the real destination.
# ---------------------------------------------------------------------------

_MEGA_PAD = 4     # NOP spacer length between dependent phases (>= 3 req'd)
_MEGA_W = 1024    # schedule window length (steps per SMEM window DMA)

# opcodes (host schedule builder: supernodal._get_mega_sched). The panel
# Cholesky+inverse is a ~48-deep SERIAL recurrence and therefore
# LATENCY-bound (~15 us/panel however formulated — masked, static-slice and
# Newton-Schulz variants all tie); computing FOUR independent panels in one
# step lets Mosaic interleave the chains (measured 8.8 us/panel). A quad is
# five schedule steps: PRE stages 3 panels from the uniform loads into VMEM
# stash, MAIN loads the 4th and runs all four recurrences, STASH1-3 flush
# the stashed results through the normal per-step write path.
(OP_UPD_FIRST, OP_UPD_CONT, OP_TRSM, OP_NOP,
 OP_CHOL4_PRE, OP_CHOL4_MAIN, OP_STASH1, OP_STASH2, OP_STASH3) = range(9)


def _chol_inv_tile(M, B):
    """Unrolled Cholesky + lower-triangular inverse of a (B, B) f32 tile.

    TPU-friendly: 2-D iota masks only, no transposes. Column j is pulled by
    a masked lane-reduction and its TRANSPOSE comes for free from the
    symmetry of the (maintained-symmetric) trailing submatrix — the outer
    product is a broadcast multiply of a (B, 1) column by a (1, B) row.
    The inverse rides IN the same loop: row j of X = L^{-1}
    (X[j, :] = (e_j - L[j, :j] X) / L[j, j]) needs only L rows <= j, which
    are final once column j is placed — fusing the two recurrences halves
    the dependent-stage count vs running them back to back (the tile is
    LATENCY-bound on its serial chain, so critical-path length, not op
    count, is the cost; measured round 5)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    L = jnp.zeros((B, B), jnp.float32)
    X = jnp.zeros((B, B), jnp.float32)
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
        # inverse row j: L[j, :j] is final in the L just written (d is
        # 1 / L[j, j], so the division is a multiply by d)
        lj = jnp.sum(jnp.where((rows == j) & (cols < j), L, 0.0),
                     axis=0, keepdims=True)       # (1, B): L[j, :j]
        acc = jax.lax.dot_general(
            lj, X, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                          # (1, B)
        ej = jnp.where((rows[:1, :] == 0) & (cols[:1, :] == j), 1.0, 0.0)
        X = jnp.where(rows == j, (ej - acc) * d, X)
    return L, X


@functools.lru_cache(maxsize=None)
def _mega_call(NE, NL, B, n_win, W, interpret):
    """One factorization mega-kernel instance: NE ext rows (incl. the
    Z = NE-2 zero and T = NE-1 trash/identity pad slots), NL Linv rows
    (identity at NL-2, trash at NL-1), B panel dim, n_win schedule windows
    of W steps each."""

    LANE = 128

    def kernel(sched_ref, ext_in, linv_in, ext_ref, linv_ref, sbuf,
               a1b0, a2b0, din0, lin0, out0, lvo0,
               a1b1, a2b1, din1, lin1, out1, lvo1,
               acc, stA, stB, stC, sx1, sx2, sx3,
               last_w, in_sem, out_sem, win_sem):
        # ext_in/linv_in are the donated aliases of ext_ref/linv_ref; all
        # reads and writes go through the OUTPUT refs (same buffers).
        # Per-slot scratch is SEPARATE whole refs (never sliced), and the
        # block storage is LANE-PADDED to (.., B, 128): Mosaic requires DMA
        # memref slices to be tile-aligned — a lane-unaligned (B, B) slice
        # is rejected — so blocks ride as (B, 128) tiles with zero pad
        # lanes, and the inner loop is unrolled x2 so the pipeline slot is
        # chosen statically.
        del ext_in, linv_in
        bufs = ((a1b0, a2b0, din0, lin0, out0, lvo0),
                (a1b1, a2b1, din1, lin1, out1, lvo1))
        T = NE - 1
        LTRASH = NL - 1
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
        eyeP = jnp.where(rows == cols, 1.0, 0.0).astype(jnp.float32)

        def padL(u):
            """(B, B) result -> (B, 128) zero-padded tile."""
            return jnp.concatenate(
                [u, jnp.zeros((B, LANE - B), jnp.float32)], axis=1)

        def win_dma(w, wslot):
            return pltpu.make_async_copy(
                sched_ref.at[w], sbuf.at[wslot], win_sem.at[wslot])

        def in_dmas(wslot, t, slot):
            """Per-operand (predicate, dma) pairs for step t. Loads are
            CONDITIONAL on the opcode (UPD needs a1/a2, TRSM needs
            din+lin, ...): ~40% of the uniform 4-loads-per-step were
            dead weight, and at 12 DMA-management ops per step the
            pipeline baseline IS the step cost — the start and the wait
            key off the same SMEM opcode, so semaphore accounting stays
            exactly balanced."""
            a1b, a2b, dinb, linb, _, _ = bufs[slot]
            op = sbuf[wslot, 0, t]
            needs_a = jnp.logical_or(op <= OP_UPD_CONT, op == OP_CHOL4_PRE)
            needs_din = ((op == OP_UPD_FIRST) | (op == OP_TRSM)
                         | (op == OP_CHOL4_PRE) | (op == OP_CHOL4_MAIN))
            needs_lin = op == OP_TRSM
            return (
                (needs_a,
                 pltpu.make_async_copy(ext_ref.at[sbuf[wslot, 1, t]],
                                       a1b, in_sem.at[slot, 0])),
                (needs_a,
                 pltpu.make_async_copy(ext_ref.at[sbuf[wslot, 2, t]],
                                       a2b, in_sem.at[slot, 1])),
                (needs_din,
                 pltpu.make_async_copy(ext_ref.at[sbuf[wslot, 3, t]],
                                       dinb, in_sem.at[slot, 2])),
                (needs_lin,
                 pltpu.make_async_copy(linv_ref.at[sbuf[wslot, 4, t]],
                                       linb, in_sem.at[slot, 3])),
            )

        def start_loads(wslot, t, slot):
            for pred, d in in_dmas(wslot, t, slot):
                @pl.when(pred)
                def _(d=d):
                    d.start()

        def out_dmas(slot, wd, wl):
            outb, lvob = bufs[slot][4], bufs[slot][5]
            return (
                pltpu.make_async_copy(outb, ext_ref.at[wd],
                                      out_sem.at[slot, 0]),
                pltpu.make_async_copy(lvob, linv_ref.at[wl],
                                      out_sem.at[slot, 1]),
            )

        # ---- warmup: window 0 + one dummy output DMA pair per slot, so
        # the slot-reuse waits at steps 0/1 are balanced. The dummies copy
        # whatever VMEM garbage is in the out buffers to the trash rows.
        win_dma(0, 0).start()
        for s in range(2):
            last_w[s, 0] = T
            last_w[s, 1] = LTRASH
            for d in out_dmas(s, T, LTRASH):
                d.start()

        def step(wslot, t, slot):
            """One schedule step; `slot` is a STATIC python int."""
            a1b, a2b, dinb, linb, outb, lvob = bufs[slot]
            op = sbuf[wslot, 0, t]
            wd = sbuf[wslot, 5, t]
            # 1. inputs for this step (started at t-1 / window entry),
            # waited under the same opcode predicates as the starts
            for pred, d in in_dmas(wslot, t, slot):
                @pl.when(pred)
                def _(d=d):
                    d.wait()
            # 2. slot's previous output DMAs (step t-2) complete: the
            # out buffers are reusable AND those writes are in HBM —
            # this is what bounds the hazard distance at 3 steps
            for d in out_dmas(slot, last_w[slot, 0], last_w[slot, 1]):
                d.wait()

            # 3. compute — pad lanes are zero on every stored tile, so
            # contracting over the full 128 lanes is exact
            @pl.when(op <= OP_UPD_CONT)
            def _():
                u = jax.lax.dot_general(
                    a1b[...], a2b[...], (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )                                     # (B, B)
                prev = jnp.where(op == OP_UPD_FIRST, dinb[...],
                                 acc[...])[:, :B]
                acc[...] = padL(prev - u)
                outb[...] = acc[...]

            @pl.when(op == OP_TRSM)
            def _():
                outb[...] = padL(jax.lax.dot_general(
                    dinb[...], linb[...], (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                ))

            @pl.when(op == OP_NOP)
            def _():
                # keeps ext[T] an exact identity (stream-solve pads
                # read it) and spaces cross-phase hazards
                outb[...] = eyeP

            @pl.when(op == OP_CHOL4_PRE)
            def _():
                # stage 3 panels for the quad's MAIN step
                stA[...] = a1b[...]
                stB[...] = a2b[...]
                stC[...] = dinb[...]
                outb[...] = eyeP    # write target is the trash slot

            @pl.when(op == OP_CHOL4_MAIN)
            def _():
                # four INDEPENDENT chol+inverse recurrences in one trace:
                # each is a serial latency-bound chain, so the scheduler
                # interleaves them (~2x panel throughput, measured)
                L1, X1 = _chol_inv_tile(stA[...][:, :B], B)
                L2, X2 = _chol_inv_tile(stB[...][:, :B], B)
                L3, X3 = _chol_inv_tile(stC[...][:, :B], B)
                L4, X4 = _chol_inv_tile(dinb[...][:, :B], B)
                stA[...] = padL(L1)
                sx1[...] = padL(X1)
                stB[...] = padL(L2)
                sx2[...] = padL(X2)
                stC[...] = padL(L3)
                sx3[...] = padL(X3)
                outb[...] = padL(L4)
                lvob[...] = padL(X4)

            @pl.when(op == OP_STASH1)
            def _():
                outb[...] = stA[...]
                lvob[...] = sx1[...]

            @pl.when(op == OP_STASH2)
            def _():
                outb[...] = stB[...]
                lvob[...] = sx2[...]

            @pl.when(op == OP_STASH3)
            def _():
                outb[...] = stC[...]
                lvob[...] = sx3[...]

            # 4. write: ext[wd] always; Linv only meaningful for the
            # chol-quad MAIN/STASH steps (everything else flushes stale
            # lvob to the trash row)
            wl = jnp.where(op >= OP_CHOL4_MAIN, wd, LTRASH)
            last_w[slot, 0] = wd
            last_w[slot, 1] = wl
            for d in out_dmas(slot, wd, wl):
                d.start()

            # 5. prefetch next step of this window (the next window's
            # first step is prefetched by its outer iteration)
            @pl.when(t + 1 < W)
            def _():
                start_loads(wslot, t + 1, 1 - slot)

        def outer(w, c):
            wslot = w % 2
            win_dma(w, wslot).wait()

            @pl.when(w + 1 < n_win)
            def _():
                win_dma(w + 1, (w + 1) % 2).start()

            # prefetch the window's first step (slot parity is global:
            # W is even, so slot (w*W + t) % 2 == t % 2)
            start_loads(wslot, 0, 0)

            def inner(u, c):
                step(wslot, 2 * u, 0)
                step(wslot, 2 * u + 1, 1)
                return c

            return jax.lax.fori_loop(0, W // 2, inner, c)

        jax.lax.fori_loop(0, n_win, outer, 0)
        # drain the final output DMA pair of each slot
        for s in range(2):
            for d in out_dmas(s, last_w[s, 0], last_w[s, 1]):
                d.wait()

    out_shape = (
        jax.ShapeDtypeStruct((NE, B, LANE), jnp.float32),
        jax.ShapeDtypeStruct((NL, B, LANE), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # schedule windows
            pl.BlockSpec(memory_space=pltpu.ANY),   # ext (donated)
            pl.BlockSpec(memory_space=pltpu.ANY),   # Linv (donated)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=(
            [pltpu.SMEM((2, 8, W), jnp.int32)]      # sched window buffers
            # per-slot (a1, a2, din, lin, out_ext, out_linv) x 2 slots
            + [pltpu.VMEM((B, 128), jnp.float32) for _ in range(12)]
            + [pltpu.VMEM((B, 128), jnp.float32)]   # acc (UPD runs)
            # chol-quad stash: L1-3 (reusing the PRE staging bufs) + X1-3
            + [pltpu.VMEM((B, 128), jnp.float32) for _ in range(6)]
            + [
                pltpu.SMEM((2, 2), jnp.int32),      # last write targets
                pltpu.SemaphoreType.DMA((2, 4)),    # input slots
                pltpu.SemaphoreType.DMA((2, 2)),    # output slots
                pltpu.SemaphoreType.DMA((2,)),      # window slots
            ]
        ),
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def factorize_mega(ext, Linv, sched, interpret: bool = False):
    """Run the whole numeric factorization in ONE pallas launch.

    ext (NE, B, B) incl. the Z/T pad slots; Linv (n+2, B, B) with the
    identity at row n and a trash row at n+1; sched a host-built
    (n_win, 8, W) int32 array of per-step rows (op, a1, a2, din, li, wd,
    0, 0) (supernodal._get_mega_sched). Returns (ext, Linv) with
    ext[T] = I. Internally the block storage is lane-padded to
    (.., B, 128) — the DMA-sliceable tile shape — and sliced back."""
    sched = jnp.asarray(sched)
    n_win, eight, W = sched.shape
    assert eight == 8 and W % 2 == 0
    B = ext.shape[-1]
    assert B % 8 == 0 and B <= 128, B
    call = _mega_call(ext.shape[0], Linv.shape[0], B, n_win, W, interpret)
    pad = ((0, 0), (0, 0), (0, 128 - B))
    # returns the LANE-PADDED factor — solve_mega consumes it directly;
    # slice [..., :B] for the unpadded view
    return call(sched, jnp.pad(ext, pad), jnp.pad(Linv, pad))


# solve opcodes (host schedule builder: supernodal._get_mega_solve_sched)
SOP_GEMV_FIRST, SOP_GEMV_CONT, SOP_DIAG, SOP_NOP = range(4)


@functools.lru_cache(maxsize=None)
def _mega_solve_call(NE, NL, NY, B, n_win, W, trans, interpret):
    """Single-launch triangular-solve sweep (forward trans=False, backward
    trans=True) over a mega-style opcode schedule. ext/Linv are the
    LANE-PADDED (.., B, 128) factor arrays from factorize_mega (read-only);
    y rides as (NY, 8, 128) row tiles (row i's vector at [i, 0, :B], trash
    row at NY-1) and is input/output aliased. Same manual-DMA pipeline and
    hazard discipline as the factorization kernel."""
    LANE = 128

    def kernel(sched_ref, ext_ref, linv_ref, y_in, y_ref, sbuf,
               blk0, lbk0, src0, dst0, out0,
               blk1, lbk1, src1, dst1, out1,
               acc, last_w, in_sem, out_sem, win_sem):
        del y_in
        bufs = ((blk0, lbk0, src0, dst0, out0),
                (blk1, lbk1, src1, dst1, out1))
        TY = NY - 1

        def win_dma(w, wslot):
            return pltpu.make_async_copy(
                sched_ref.at[w], sbuf.at[wslot], win_sem.at[wslot])

        def in_dmas(wslot, t, slot):
            """Per-operand (predicate, dma) pairs — loads conditional on
            the opcode (GEMV needs the ext block + y[src] (+ y[dst] at a
            run start); DIAG needs the Linv block + y[src]); start and
            wait key off the same SMEM opcode (see the factorization
            kernel's note on balanced semaphore accounting)."""
            blkb, lbkb, srcb, dstb, _ = bufs[slot]
            op = sbuf[wslot, 0, t]
            is_gemv = op <= SOP_GEMV_CONT
            return (
                (is_gemv,
                 pltpu.make_async_copy(ext_ref.at[sbuf[wslot, 1, t]],
                                       blkb, in_sem.at[slot, 0])),
                (op == SOP_DIAG,
                 pltpu.make_async_copy(linv_ref.at[sbuf[wslot, 2, t]],
                                       lbkb, in_sem.at[slot, 1])),
                (op != SOP_NOP,
                 pltpu.make_async_copy(y_ref.at[sbuf[wslot, 3, t]],
                                       srcb, in_sem.at[slot, 2])),
                (op == SOP_GEMV_FIRST,
                 pltpu.make_async_copy(y_ref.at[sbuf[wslot, 4, t]],
                                       dstb, in_sem.at[slot, 3])),
            )

        def start_loads(wslot, t, slot):
            for pred, d in in_dmas(wslot, t, slot):
                @pl.when(pred)
                def _(d=d):
                    d.start()

        def out_dma(slot, wd):
            return pltpu.make_async_copy(bufs[slot][4], y_ref.at[wd],
                                         out_sem.at[slot])

        win_dma(0, 0).start()
        for s in range(2):
            last_w[s] = TY
            out_dma(s, TY).start()

        def pad_row(r):
            """(1, B) or (1, 128) row -> (8, 128) tile (rows 1-7 zero)."""
            if r.shape[1] < LANE:
                r = jnp.concatenate(
                    [r, jnp.zeros((1, LANE - r.shape[1]), jnp.float32)], 1)
            return jnp.concatenate(
                [r, jnp.zeros((7, LANE), jnp.float32)], 0)

        def step(wslot, t, slot):
            blkb, lbkb, srcb, dstb, outb = bufs[slot]
            op = sbuf[wslot, 0, t]
            wd = sbuf[wslot, 5, t]
            for pred, d in in_dmas(wslot, t, slot):
                @pl.when(pred)
                def _(d=d):
                    d.wait()
            out_dma(slot, last_w[slot]).wait()

            ysrc = srcb[0:1, :]                        # (1, 128)

            def matvec(mat):
                # row-vector forms avoid in-kernel transposes:
                #   fwd: (M @ y)^T = y_row contract M's lane (col) index
                #   bwd: (M^T @ y)^T = y_row[:, :B] contract M's sublane
                if trans:
                    return jax.lax.dot_general(
                        ysrc[:, :B], mat, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )                                   # (1, 128)
                r = jax.lax.dot_general(
                    ysrc, mat, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )                                       # (1, B)
                return jnp.concatenate(
                    [r, jnp.zeros((1, LANE - B), jnp.float32)], 1)

            @pl.when(op <= SOP_GEMV_CONT)
            def _():
                res = matvec(blkb[...])
                base = jnp.where(op == SOP_GEMV_FIRST, dstb[0:1, :],
                                 acc[0:1, :])
                acc[...] = pad_row(base - res)
                outb[...] = acc[...]

            @pl.when(op == SOP_DIAG)
            def _():
                outb[...] = pad_row(matvec(lbkb[...]))

            @pl.when(op == SOP_NOP)
            def _():
                outb[...] = jnp.zeros((8, LANE), jnp.float32)

            last_w[slot] = wd
            out_dma(slot, wd).start()

            @pl.when(t + 1 < W)
            def _():
                start_loads(wslot, t + 1, 1 - slot)

        def outer(w, c):
            wslot = w % 2
            win_dma(w, wslot).wait()

            @pl.when(w + 1 < n_win)
            def _():
                win_dma(w + 1, (w + 1) % 2).start()

            start_loads(wslot, 0, 0)

            def inner(u, c):
                step(wslot, 2 * u, 0)
                step(wslot, 2 * u + 1, 1)
                return c

            return jax.lax.fori_loop(0, W // 2, inner, c)

        jax.lax.fori_loop(0, n_win, outer, 0)
        for s in range(2):
            out_dma(s, last_w[s]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NY, 8, LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # schedule windows
            pl.BlockSpec(memory_space=pltpu.ANY),   # ext (padded, RO)
            pl.BlockSpec(memory_space=pltpu.ANY),   # Linv (padded, RO)
            pl.BlockSpec(memory_space=pltpu.ANY),   # y (donated)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=(
            [pltpu.SMEM((2, 8, W), jnp.int32)]
            # per-slot (blk, linv_blk, y_src, y_dst, out) x 2 slots
            + [pltpu.VMEM((B, 128), jnp.float32),
               pltpu.VMEM((B, 128), jnp.float32),
               pltpu.VMEM((8, 128), jnp.float32),
               pltpu.VMEM((8, 128), jnp.float32),
               pltpu.VMEM((8, 128), jnp.float32)] * 2
            + [
                pltpu.VMEM((8, 128), jnp.float32),  # acc (gemv runs)
                pltpu.SMEM((2,), jnp.int32),        # last write targets
                pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        ),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def solve_mega(ext_p, Linv_p, y, sched, *, trans: bool,
               interpret: bool = False):
    """One triangular-solve sweep in ONE pallas launch.

    ext_p/Linv_p: the lane-padded (.., B, 128) factor from factorize_mega
    (pass-through, read-only). y: (NY, 8, 128) row tiles (trash row NY-1),
    donated. sched: (n_win, 8, W) int32 rows (op, ext, linv, ysrc, ydst,
    wd, 0, 0). trans=False runs the forward sweep (L y = r), trans=True
    the backward (L^T x = y). Returns the updated y."""
    sched = jnp.asarray(sched)
    n_win, eight, W = sched.shape
    assert eight == 8 and W % 2 == 0
    B = ext_p.shape[-2]
    call = _mega_solve_call(ext_p.shape[0], Linv_p.shape[0], y.shape[0],
                            B, n_win, W, bool(trans), interpret)
    return call(sched, ext_p, Linv_p, y)


# selected-inverse opcodes (host schedule builder:
# supernodal._get_mega_sel_sched). Blocked Takahashi recurrence per column j
# (reverse level order), expressed against the mega factor's stored panel
# inverses so every step is a pure GEMM:
#   ACC_F{N,T}/ACC_{N,T}  acc (=|+=) S[a1][:, :B]^{(T)} @ L[a2]
#   FIN_OFF               S[wd] = -acc[:, :B] @ Linv[li]      (S_ij run end)
#   DIAG0                 S[wd] = Linv[li]^T @ Linv[li]       (empty struct)
#   FIN_DIAG              S[wd] = Linv^T Linv - acc @ Linv, symmetrized
#   NOP                   hazard spacer (writes zeros to the trash row)
(XOP_ACC_FN, XOP_ACC_FT, XOP_ACC_N, XOP_ACC_T,
 XOP_FIN_OFF, XOP_DIAG0, XOP_FIN_DIAG, XOP_NOP) = range(8)


@functools.lru_cache(maxsize=None)
def _mega_sel_call(NE, NL, B, n_win, W, interpret):
    """Single-launch blocked-Takahashi selected inverse over a mega-style
    opcode schedule. ext/Linv are the LANE-PADDED (.., B, 128) factor arrays
    from factorize_mega (read-only); S is the same (NE, B, 128) layout
    (trash row NE-1), input/output aliased. Same manual-DMA pipeline and
    hazard discipline as the factorization kernel: per-level phases
    [off-diag ACC runs + FIN_OFF | NOP pad | diag ACC runs + FIN_DIAG |
    NOP pad], reverse level order — every in-level read of an in-level
    write crosses a >= _MEGA_PAD spacer."""
    LANE = 128

    def kernel(sched_ref, ext_ref, linv_ref, s_in, s_ref, sbuf,
               a1b0, a2b0, lin0, out0,
               a1b1, a2b1, lin1, out1,
               acc, last_w, in_sem, out_sem, win_sem):
        del s_in
        bufs = ((a1b0, a2b0, lin0, out0), (a1b1, a2b1, lin1, out1))
        TS = NE - 1
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
        eyeP = jnp.where(rows == cols, 1.0, 0.0).astype(jnp.float32)

        def dot(a, b, dims):
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        def win_dma(w, wslot):
            return pltpu.make_async_copy(
                sched_ref.at[w], sbuf.at[wslot], win_sem.at[wslot])

        def in_dmas(wslot, t, slot):
            a1b, a2b, linb, _ = bufs[slot]
            op = sbuf[wslot, 0, t]
            is_acc = op <= XOP_ACC_T
            needs_lin = jnp.logical_and(op >= XOP_FIN_OFF,
                                        op <= XOP_FIN_DIAG)
            return (
                (is_acc,
                 pltpu.make_async_copy(s_ref.at[sbuf[wslot, 1, t]],
                                       a1b, in_sem.at[slot, 0])),
                (is_acc,
                 pltpu.make_async_copy(ext_ref.at[sbuf[wslot, 2, t]],
                                       a2b, in_sem.at[slot, 1])),
                (needs_lin,
                 pltpu.make_async_copy(linv_ref.at[sbuf[wslot, 3, t]],
                                       linb, in_sem.at[slot, 2])),
            )

        def start_loads(wslot, t, slot):
            for pred, d in in_dmas(wslot, t, slot):
                @pl.when(pred)
                def _(d=d):
                    d.start()

        def out_dma(slot, wd):
            return pltpu.make_async_copy(bufs[slot][3], s_ref.at[wd],
                                         out_sem.at[slot])

        win_dma(0, 0).start()
        for s in range(2):
            last_w[s] = TS
            out_dma(s, TS).start()

        def step(wslot, t, slot):
            a1b, a2b, linb, outb = bufs[slot]
            op = sbuf[wslot, 0, t]
            wd = sbuf[wslot, 4, t]
            for pred, d in in_dmas(wslot, t, slot):
                @pl.when(pred)
                def _(d=d):
                    d.wait()
            out_dma(slot, last_w[slot]).wait()

            @pl.when(op <= XOP_ACC_T)
            def _():
                a1s = a1b[...][:, :B]                   # (B, B)
                un = dot(a1s, a2b[...], ((1,), (0,)))   # S_ik   @ L_kj
                ut = dot(a1s, a2b[...], ((0,), (0,)))   # S_ki^T @ L_kj
                is_tr = jnp.logical_or(op == XOP_ACC_FT, op == XOP_ACC_T)
                u = jnp.where(is_tr, ut, un)
                base = jnp.where(op <= XOP_ACC_FT,
                                 jnp.zeros((B, LANE), jnp.float32), acc[...])
                acc[...] = base + u

            @pl.when(op == XOP_FIN_OFF)
            def _():
                outb[...] = -dot(acc[...][:, :B], linb[...], ((1,), (0,)))

            @pl.when(op == XOP_DIAG0)
            def _():
                lins = linb[...][:, :B]
                outb[...] = dot(lins, linb[...], ((0,), (0,)))

            @pl.when(op == XOP_FIN_DIAG)
            def _():
                lins = linb[...][:, :B]
                M = (dot(lins, linb[...], ((0,), (0,)))
                     - dot(acc[...][:, :B], linb[...], ((1,), (0,))))
                Mt = dot(M[:, :B], eyeP, ((0,), (0,)))  # M^T, lane-padded
                outb[...] = 0.5 * (M + Mt)

            @pl.when(op == XOP_NOP)
            def _():
                outb[...] = jnp.zeros((B, LANE), jnp.float32)

            last_w[slot] = wd
            out_dma(slot, wd).start()

            @pl.when(t + 1 < W)
            def _():
                start_loads(wslot, t + 1, 1 - slot)

        def outer(w, c):
            wslot = w % 2
            win_dma(w, wslot).wait()

            @pl.when(w + 1 < n_win)
            def _():
                win_dma(w + 1, (w + 1) % 2).start()

            start_loads(wslot, 0, 0)

            def inner(u, c):
                step(wslot, 2 * u, 0)
                step(wslot, 2 * u + 1, 1)
                return c

            return jax.lax.fori_loop(0, W // 2, inner, c)

        jax.lax.fori_loop(0, n_win, outer, 0)
        for s in range(2):
            out_dma(s, last_w[s]).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NE, B, LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # schedule windows
            pl.BlockSpec(memory_space=pltpu.ANY),   # ext (padded, RO)
            pl.BlockSpec(memory_space=pltpu.ANY),   # Linv (padded, RO)
            pl.BlockSpec(memory_space=pltpu.ANY),   # S (donated)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=(
            [pltpu.SMEM((2, 8, W), jnp.int32)]
            # per-slot (S block, L block, Linv block, out) x 2 slots
            + [pltpu.VMEM((B, 128), jnp.float32) for _ in range(8)]
            + [
                pltpu.VMEM((B, 128), jnp.float32),  # acc (T_ij runs)
                pltpu.SMEM((2,), jnp.int32),        # last write targets
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        ),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def selected_inverse_mega(ext_p, Linv_p, S, sched, interpret: bool = False):
    """Blocked-Takahashi selected inverse in ONE pallas launch.

    ext_p/Linv_p: the lane-padded (.., B, 128) factor from factorize_mega
    (read-only). S: (NE, B, 128) selected-inverse storage, pre-seeded (zeros,
    plus dense-tail blocks when present), donated; trash row at NE-1. sched:
    (n_win, 8, W) int32 rows (op, a1, a2, li, wd, 0, 0, 0) from
    supernodal._get_mega_sel_sched. Returns the updated S — every fill-
    pattern block of H^{-1}, compile cost O(1) in levels (the XLA Takahashi
    unrolls ~48 levels into a ~28-minute compile at 10k states; this kernel
    compiles in ~20 s at any scale)."""
    sched = jnp.asarray(sched)
    n_win, eight, W = sched.shape
    assert eight == 8 and W % 2 == 0
    B = ext_p.shape[-2]
    call = _mega_sel_call(ext_p.shape[0], Linv_p.shape[0], B, n_win, W,
                          interpret)
    return call(sched, ext_p, Linv_p, S)


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
