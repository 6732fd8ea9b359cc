"""General block-sparse Cholesky over the elimination-tree level schedule —
the S9 path for graphs that fit neither the chain structure nor a dense
Hessian (loop-closure pose graphs; SURVEY.md §2.2 S7-S9, §7 M4).

Replaces GTSAM's sequential multifrontal elimination with a LEVEL-BATCHED
left-looking block factorization driven by STATIC schedules:

  host (once per sparsity pattern, ops/order.py): min-degree ordering ->
  symbolic elimination -> block storage map -> per-level index arrays for
  (a) update application  L[i,j] -= L[i,k] L[j,k]^T   (gather-matmul-scatter)
  (b) column factorization (batched small-block Cholesky + solves)
  (c) forward/backward substitution contributions.

  device (every iteration): one jitted pass over the levels — every level is
  a handful of BATCHED dense block ops (the TPU replacement for hot loop #2
  / #3 of SURVEY.md §3.1). Assembly scatters per-factor J^T J blocks
  straight into the block storage with precomputed destination ids.

Mixed block sizes (e.g. poses + landmarks) are handled by PADDING every
variable's tangent block to the largest group dimension: padded diagonal
entries get an identity (so blocks stay SPD), padded gradient entries are
zero, and the padded delta components solve to exactly zero — the static
shapes stay uniform, which is what the batched level kernels need.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from . import order as order_mod
from . import smallblock as sb

# auto mode: beyond this many etree levels, Python-unrolled level tracing
# makes compile time the bottleneck -> switch to the device-side stream
_STREAM_LEVELS = 48
# stream chunk sizes: big chunks carry the bulk work, small chunks the
# per-level tails (waste < _CS blocks per level per op type)
_CS = 64
_CB_CAP = 2048


def _run_ordering(indptr, indices, ordering: str):
    if ordering == "md":
        return order_mod.min_degree_ordering(indptr, indices)
    if ordering == "nd":
        return order_mod.nested_dissection_ordering(indptr, indices)
    raise ValueError(f"unknown ordering {ordering!r}")


def _ladder(per_level):
    """Power-of-two chunk-size ladder for one op type, from its per-level
    work distribution: [top, top/2, ..., _CS]. Levels pack into the FEWEST
    chunks (round the remainder UP to the next rung): on this backend every
    stream STEP carries a large fixed dispatch cost (measured ~0.4 ms per
    XLA gather/scatter op and ~2.5 ms per pallas_call launch — see
    BASELINE.md round 4), so step count, not padded FLOPs, is what the
    packing must minimize. Padded lanes compute exact no-ops on the trash
    slots; waste is bounded by 2x the level's rows."""
    works = [len(x) for x in per_level if len(x)]
    if not works:
        return [_CS]
    top = 1 << (int(max(works)) - 1).bit_length()
    top = max(_CS, min(_CB_CAP, top))
    sizes = []
    c = top
    while c > _CS:
        sizes.append(c)
        c //= 2
    sizes.append(_CS)
    return sizes


def _pack_multi(per_level, pad_row):
    """Chunk one op type's per-level row lists onto its size ladder.

    per_level: list (levels) of (w, k) int arrays — rows to process at that
    level, in order. Full top-size chunks carry the bulk; the remainder
    becomes ONE chunk rounded UP to the smallest rung that fits (padded
    with `pad_row` rows pointing at the zero/trash slots, so padded lanes
    compute exact no-ops) — fewest steps per level, waste <= 2x.

    Returns (sizes, arrays: per size (S_i, k, C_i) int32,
             sched: per level list of (size_idx, chunk_idx)).
    """
    pad_row = np.asarray(pad_row, np.int32)
    sizes = _ladder(per_level)  # descending powers of two
    chunks: list = [[] for _ in sizes]
    sched = []
    for rows in per_level:
        lv: list = []
        if len(rows):
            rows = np.asarray(rows, np.int32).reshape(len(rows), -1)
            w, i = len(rows), 0
            while i < w:
                rem = w - i
                if rem >= sizes[0]:
                    si = 0  # full top-size chunk
                else:
                    # smallest rung >= rem (sizes descending)
                    si = next(
                        (s for s in range(len(sizes) - 1, -1, -1)
                         if sizes[s] >= rem),
                        0,
                    )
                C = sizes[si]
                take = rows[i:i + C]
                i += len(take)
                if len(take) < C:
                    take = np.concatenate(
                        [take, np.tile(pad_row[None], (C - len(take), 1))], 0
                    )
                lv.append((si, len(chunks[si])))
                chunks[si].append(take)
        sched.append(lv)
    arrays = []
    for si, C in enumerate(sizes):
        if not chunks[si]:
            chunks[si].append(np.tile(pad_row[None], (C, 1)))
        arrays.append(np.stack(chunks[si]).transpose(0, 2, 1)
                      .astype(np.int32))
    return sizes, arrays, sched


def _collapse_sorted(u, dst):
    """Collapse duplicate destinations in a dst-SORTED chunk: returns
    (u2, dst2) with one summed contribution per distinct dst — the scatter
    then carries sorted near-unique indices instead of colliding ones
    (XLA TPU scatter serializes on collisions). Empty tail segments get a
    copy of the last dst with a zero payload (harmless add)."""
    C = dst.shape[0]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), dst[1:] != dst[:-1]]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    u2 = jax.ops.segment_sum(u, seg, num_segments=C,
                             indices_are_sorted=True)
    start = jnp.nonzero(first, size=C, fill_value=C - 1)[0]
    dst2 = dst[start]
    return u2, dst2


class _Stream:
    """Host-side instruction stream: opcodes + per-branch schedule arrays.

    Everything is NUMPY — the arrays become jit-trace constants inside the
    kernels (never eager device arrays: this object is cached across traces,
    and jnp arrays created inside one trace would leak tracers into the
    next)."""

    def __init__(self, opcodes, arg_idx, branches):
        self.opcodes = np.asarray(opcodes, np.int32)
        self.arg_idx = np.asarray(arg_idx, np.int32)
        # branches: list of (kind, sched_array (S, k, C))
        self.branches = branches
        self.n_steps = len(opcodes)


def _build_branched(kinds_rows_pads):
    """kinds_rows_pads: list of (kind, per_level_rows, pad_row). Returns
    (branches [(kind, array)], per-kind sched lists aligned with input)."""
    branches = []
    scheds = []
    for kind, per_level, pad in kinds_rows_pads:
        base = len(branches)
        _, arrays, sched = _pack_multi(per_level, pad)
        for arr in arrays:
            branches.append((kind, arr))
        scheds.append([[(base + si, ci) for si, ci in lv] for lv in sched])
    return branches, scheds


class SupernodalSolver:
    """Build once per graph structure; `solver` property plugs into lm_solve.

    `ordering`: "md" (min-degree, lowest fill — best for small graphs) or
    "nd" (nested dissection — balanced elimination tree, the right choice
    for large graphs where etree DEPTH is the TPU bottleneck).
    `mode`: "unrolled" traces one XLA op sequence per level (fastest at
    runtime for few levels, compile time O(levels)); "stream" runs one
    `lax.fori_loop` over a device-side chunked instruction stream (compile
    time O(1) in levels — the path that removes the variable-count cap);
    "auto" picks by level count.

    `dense_tail`: number of TRAILING elimination positions factored as ONE
    dense Cholesky instead of block-sparse level schedules — the classic
    supernodal switch-to-dense (CHOLMOD's dense-root trick; reference
    framing: gtsam's multifrontal root cliques, SURVEY.md §2.2 S9). With a
    fill-reducing ordering the trailing positions are the top separators,
    where (a) fill is near-dense anyway and (b) the serialized level-by-
    level elimination is both latency- and FLOP-bound on tiny blocks. One
    (dense_tail*b)^2 Cholesky instead runs at MXU speed and removes the
    deepest O(separator) levels from the schedule entirely.
    """

    def __init__(self, graph: Graph, values, ordering: str = "md",
                 mode: str = "auto", dense_tail: int = 0, _symbolic=None):
        self.groups = list(values.keys())
        dims = {g: graph.manifolds[g].dim for g in self.groups}
        self.b = max(dims.values())
        self.group_sizes = {
            g: jax.tree_util.tree_leaves(values[g])[0].shape[0]
            for g in self.groups
        }
        self.group_offset = {}
        off = 0
        for g in self.groups:
            self.group_offset[g] = off
            off += self.group_sizes[g]
        n = off
        self.n = n
        # per-variable tangent dim (global variable numbering)
        var_dim = np.zeros(n, np.int64)
        for g in self.groups:
            var_dim[self.group_offset[g] : self.group_offset[g]
                    + self.group_sizes[g]] = dims[g]
        self.var_dim = var_dim

        if _symbolic is not None:
            # precomputed (perm, struct, parent) — subclasses that need the
            # symbolic pass for their OWN analysis (e.g. subtree tail
            # selection) thread it through instead of re-running the host
            # adjacency + ordering + symbolic factorization (the dominant
            # host-side preprocessing cost on large graphs)
            perm, struct, parent = _symbolic
        else:
            indptr, indices, _ = order_mod.adjacency_from_graph(graph, values)
            perm = _run_ordering(indptr, indices, ordering)
            struct, parent, _fill = order_mod.symbolic_factor(
                indptr, indices, perm)
        self.perm = perm  # perm[pos] = variable
        pos = np.zeros(n, np.int64)
        pos[perm] = np.arange(n)
        self.pos = pos
        self.n_tail = min(max(int(dense_tail), 0), n)
        self._build_numeric_schedules(struct, parent)
        self._set_mode(mode)
        self._build_assembly(graph)
        self._build_pad_eye(var_dim)

    def _set_mode(self, mode: str):
        if mode == "auto":
            mode = "stream" if len(self.levels) > _STREAM_LEVELS else "unrolled"
        if mode not in ("unrolled", "stream", "pallas", "pallas_stream",
                        "mega"):
            raise ValueError(f"unknown schedule mode {mode!r}")
        if mode in ("pallas", "pallas_stream", "mega") and self.b % 8 != 0:
            raise ValueError(
                f"pallas mode needs a block dim divisible by 8 (sublane "
                f"tiling); got b={self.b} — use amalgamated panels"
            )
        self._mode = mode
        self._stream = {}  # built lazily on first factorize, keyed by pallas
        self._pallas_sched = None
        self._mega_sched = None
        self._mega_solve_sched = None
        self._mega_sel_sched = None

    def _build_numeric_schedules(self, struct, parent):
        """Per-level static schedules for the block factorization/solves.
        Uses self.n (block-variable count, elimination positions) and the
        column structure; independent of block size."""
        n = self.n
        self.struct = struct  # kept for the selected-inverse schedules
        # block storage: [0..n) diagonal blocks by column position,
        # then off-diagonal blocks (i, j) i > j (elimination positions)
        off_id: Dict[Tuple[int, int], int] = {}
        nid = n
        for j in range(n):
            for i in struct[j]:
                off_id[(i, j)] = nid
                nid += 1
        self.n_blocks = nid
        self.off_id = off_id

        levels = order_mod.etree_levels(parent)
        ns = n - self.n_tail  # positions >= ns are the dense tail
        if self.n_tail:
            # levels whose every column is in the tail vanish from the
            # schedules entirely (typically the deepest separator levels);
            # one trailing empty level hosts tail-destined update/gemv work
            # sourced from the last real level (sources must be finalized
            # strictly before that work runs)
            levels = [lv for lv in levels if any(j < ns for j in lv)] + [[]]
        self.levels = levels

        # ---- schedules -------------------------------------------------
        # update triples per level of the destination column j:
        #   dst block (i, j) [diag if i == j]  -=  L[i,k] @ L[j,k]^T
        upd: List[List[Tuple[int, int, int]]] = [[] for _ in levels]
        level_of = np.zeros(n, np.int64)
        for li, lv in enumerate(levels):
            for j in lv:
                level_of[j] = li
        # tail destinations: an update from a non-tail source k into a tail
        # block needs column k finalized (k's trsm runs at level_of[k],
        # after that level's upd phase) — schedule it at level_of[k] + 1's
        # upd phase (the trailing empty level catches last-level sources).
        # Left-looking by destination only matters for dsts the schedule
        # re-reads; tail blocks are read once, by the dense gather after
        # ALL levels, so any level > level_of[k] is correct.
        for k in range(ns):
            sk = struct[k]
            lk = int(level_of[k])
            for a, j in enumerate(sk):
                lj = int(level_of[j]) if j < ns else lk + 1
                upd[lj].append((j, off_id[(j, k)], off_id[(j, k)]))
                for i in sk[a + 1 :]:
                    upd[lj].append((off_id[(i, j)], off_id[(i, k)], off_id[(j, k)]))
        self.upd_sched = [
            (
                np.asarray([t[0] for t in u], np.int32),
                np.asarray([t[1] for t in u], np.int32),
                np.asarray([t[2] for t in u], np.int32),
            )
            for u in upd
        ]
        # column factorization per level: diagonal ids == column positions;
        # off blocks of the column + their diag id (tail columns excluded —
        # the dense tail factorizes them)
        self.col_sched = []
        for lv in levels:
            lv_s = [j for j in lv if j < ns]
            cols = np.asarray(lv_s, np.int32)
            offs = []
            offs_diag = []
            for j in lv_s:
                for i in struct[j]:
                    offs.append(off_id[(i, j)])
                    offs_diag.append(j)
            self.col_sched.append(
                (cols, np.asarray(offs, np.int32), np.asarray(offs_diag, np.int32))
            )
        # forward solve: y[j] -= L[j,k] y[k] for j in struct[k] (dst level of
        # j; tail-destined contributions ride at level_of[k] + 1 like the
        # factorization updates — y[k] is final after k's level)
        fwd: List[List[Tuple[int, int, int]]] = [[] for _ in levels]
        for k in range(ns):
            lk = int(level_of[k])
            for j in struct[k]:
                lj = int(level_of[j]) if j < ns else lk + 1
                fwd[lj].append((j, off_id[(j, k)], k))
        self.fwd_sched = [
            (
                np.asarray([t[0] for t in f], np.int32),
                np.asarray([t[1] for t in f], np.int32),
                np.asarray([t[2] for t in f], np.int32),
            )
            for f in fwd
        ]
        # backward solve: x[j] -= L[i,j]^T x[i] for i in struct[j]; tail
        # columns j are dense-solved, tail SOURCES i are fine anywhere (the
        # dense tail solve runs before the backward stream)
        bwd: List[List[Tuple[int, int, int]]] = [[] for _ in levels]
        for j in range(ns):
            for i in struct[j]:
                bwd[int(level_of[j])].append((j, off_id[(i, j)], i))
        self.bwd_sched = [
            (
                np.asarray([t[0] for t in bb], np.int32),
                np.asarray([t[1] for t in bb], np.int32),
                np.asarray([t[2] for t in bb], np.int32),
            )
            for bb in bwd
        ]

        # ---- dense-tail gather map ------------------------------------
        # every EXISTING tail block (diag j >= ns; off (i, j), j >= ns —
        # then i >= ns too since struct holds ancestors) and its (row, col)
        # in the dense tail matrix; structural zeros stay zero
        self.ns = ns
        if self.n_tail:
            t_ids, t_ri, t_rj = [], [], []
            for j in range(ns, n):
                t_ids.append(j)
                t_ri.append(j - ns)
                t_rj.append(j - ns)
                for i in struct[j]:
                    t_ids.append(off_id[(i, j)])
                    t_ri.append(i - ns)
                    t_rj.append(j - ns)
            self._tail_map = (
                np.asarray(t_ids, np.int32),
                np.asarray(t_ri, np.int32),
                np.asarray(t_rj, np.int32),
            )
        else:
            self._tail_map = None

    def _build_assembly(self, graph):
        # ---- factor-batch assembly destinations ------------------------
        # per batch, per ordered slot pair (s, t): destination block id and
        # whether the contribution must be transposed (stored lower)
        pos = self.pos
        off_id = self.off_id
        self.assembly = []
        for batch in graph.batches:
            idx = [
                np.asarray(ix) + self.group_offset[batch.groups[si]]
                for si, ix in enumerate(batch.idx)
            ]
            per_pair = []
            for s in range(len(batch.groups)):
                for t in range(len(batch.groups)):
                    ps = pos[idx[s]]
                    pt = pos[idx[t]]
                    if s == t:
                        dst = ps.astype(np.int32)
                        transpose = np.zeros(len(ps), bool)
                        keep = np.ones(len(ps), bool)
                    elif s < t:
                        dst = np.zeros(len(ps), np.int32)
                        transpose = ps < pt  # store at (max, min)
                        keep = np.ones(len(ps), bool)
                        for m in range(len(ps)):
                            i, j = (int(pt[m]), int(ps[m])) if ps[m] < pt[m] else (
                                int(ps[m]), int(pt[m]))
                            dst[m] = off_id[(i, j)]
                    else:
                        continue  # (t, s) with t < s already covered
                    per_pair.append((s, t, jnp.asarray(dst),
                                     jnp.asarray(transpose), keep))
            self.assembly.append(per_pair)

    def _build_pad_eye(self, var_dim):
        # identity on PADDED diagonal dims (variable dim < b), by position
        pad_eye = np.zeros((self.n, self.b, self.b))
        for v in range(self.n):
            d = int(var_dim[v])
            for q in range(d, self.b):
                pad_eye[int(self.pos[v]), q, q] = 1.0
        self._pad_eye = pad_eye

    # ------------------------------------------------------------ numeric
    def assemble_raw(self, graph, lins, values, assembly=None):
        """Scatter per-factor J^T J / J^T r into block storage — NO damping.

        `assembly` overrides the destination tables (used by the sharded
        solver, which passes per-device slices of the same tables)."""
        dtype = jax.tree_util.tree_leaves(values)[0].dtype
        b = self.b
        blocks = jnp.zeros((self.n_blocks, b, b), dtype)
        g = jnp.zeros((self.n, b), dtype)
        if assembly is None:
            assembly = self.assembly

        def pad_last(J):
            d = J.shape[-1]
            if d == b:
                return J
            return jnp.pad(J, ((0, 0), (0, 0), (0, b - d)))

        for batch, lin, pairs in zip(graph.batches, lins, assembly):
            for s in range(len(batch.groups)):
                Js = pad_last(lin.J[s])
                contrib = jnp.einsum("mri,mr->mi", Js, lin.r)
                ps = jnp.asarray(self.pos)[
                    batch.idx[s] + self.group_offset[batch.groups[s]]
                ]
                g = g.at[ps].add(contrib)
            for s, t, dst, transpose, _keep in pairs:
                blk = jnp.einsum(
                    "mri,mrj->mij", pad_last(lin.J[s]), pad_last(lin.J[t])
                )
                blk = jnp.where(transpose[:, None, None],
                                jnp.swapaxes(blk, -1, -2), blk)
                blocks = blocks.at[dst].add(blk)
        return blocks, g

    def add_damping(self, blocks, lam):
        """LM damping + identity on padded dims (keeps diag blocks SPD)."""
        dtype = blocks.dtype
        return blocks.at[jnp.arange(self.n)].add(
            lam * jnp.eye(self.b, dtype=dtype)
            + jnp.asarray(self._pad_eye, dtype)
        )

    def assemble(self, graph, lins, values, lam):
        blocks, g = self.assemble_raw(graph, lins, values)
        return self.add_damping(blocks, lam), g

    # --------------------------------------------------- stream scheduling
    def _get_stream(self, pallas: bool = False):
        """Build (once) the chunked device-side instruction streams.

        Factorization stream opcodes: 0/1 UPD big/small, 2/3 CHOL, 4/5 TRSM.
        Solve streams (forward and backward): 0/1 GEMV, 2/3 DIAG-solve.
        Padding rows point at dedicated block slots Z (zero, id n_blocks) and
        T (identity 'trash', id n_blocks+1) and rhs row TY (id n), so padded
        lanes compute exact no-ops: T -= Z@Z^T keeps T = I, chol(I) = I,
        trsm(I, I) = I, y[TY] -= Z@y[TY] keeps y[TY] = 0.

        pallas=True builds the gather-GEMM variant of the same streams
        (mode="pallas_stream"): TRSM second operands and DIAG first operands
        index the Linv panel-inverse table (n+1 rows, identity trash at n)
        instead of the block storage, so those pads remap T -> TY.
        """
        if pallas in self._stream:
            return self._stream[pallas]
        Z, T, TY = self.n_blocks, self.n_blocks + 1, self.n
        L = len(self.levels)

        def by_dst(rows_list):
            # sort each level's rows by destination: duplicate-dst updates
            # become contiguous, so the kernels can collapse them with a
            # sorted segment_sum BEFORE the scatter (TPU scatter serializes
            # on colliding indices — measured 9 s vs the ~30 ms FLOP bound
            # on a 50k-state graph before this)
            out = []
            for rows in rows_list:
                if len(rows):
                    order = np.argsort(rows[:, 0], kind="stable")
                    rows = rows[order]
                out.append(rows)
            return out

        upd_rows = by_dst([np.stack(u, 1) if len(u[0]) else np.zeros((0, 3))
                           for u in self.upd_sched])
        chol_rows = by_dst([c[0].reshape(-1, 1) for c in self.col_sched])
        trsm_rows = by_dst([np.stack([c[1], c[2]], 1) if len(c[1])
                            else np.zeros((0, 2)) for c in self.col_sched])
        fwd_rows = by_dst([np.stack(f, 1) if len(f[0]) else np.zeros((0, 3))
                           for f in self.fwd_sched])
        bwd_rows = by_dst([np.stack(bb, 1) if len(bb[0]) else np.zeros((0, 3))
                           for bb in self.bwd_sched])
        # diag-solve rows carry separate block / rhs indices (pads differ)
        diag_rows = by_dst([np.stack([c[0], c[0]], 1)
                            for c in self.col_sched])

        fact_br, (upd_lv, chol_lv, trsm_lv) = _build_branched([
            ("upd", upd_rows, (T, Z, Z)),
            ("chol", chol_rows, (T,)),
            ("trsm", trsm_rows, (T, TY if pallas else T)),
        ])
        diag_pad = (TY if pallas else T, TY)
        fwd_br, (fg_lv, fdg_lv) = _build_branched([
            ("gemv", fwd_rows, (TY, Z, TY)),
            ("diag", diag_rows, diag_pad),
        ])
        bwd_br, (bg_lv, bdg_lv) = _build_branched([
            ("gemv", bwd_rows, (TY, Z, TY)),
            ("diag", diag_rows, diag_pad),
        ])

        def seq(level_order, phase_lists):
            ops, args = [], []
            for li in level_order:
                for phases in phase_lists:
                    for op, ci in phases[li]:
                        ops.append(op)
                        args.append(ci)
            return ops, args

        self._stream[pallas] = (
            _Stream(*seq(range(L), [upd_lv, chol_lv, trsm_lv]), fact_br),
            _Stream(*seq(range(L), [fg_lv, fdg_lv]), fwd_br),
            _Stream(*seq(reversed(range(L)), [bg_lv, bdg_lv]), bwd_br),
        )
        return self._stream[pallas]

    def _factorize_stream(self, blocks):
        fact, _, _ = self._get_stream()
        dtype = blocks.dtype
        pad = jnp.stack([jnp.zeros((self.b, self.b), dtype),
                         jnp.eye(self.b, dtype=dtype)])
        blocks = jnp.concatenate([blocks, pad], 0)

        def upd(sched):
            def f(blocks, ai):
                dst, s1, s2 = sched[ai]
                u = sb.matmul_hp(blocks[s1],
                                 jnp.swapaxes(blocks[s2], -1, -2))
                u2, dst2 = _collapse_sorted(u, dst)
                return blocks.at[dst2].add(-u2, indices_are_sorted=True)
            return f

        def chol(sched):
            def f(blocks, ai):
                cols = sched[ai][0]
                return blocks.at[cols].set(sb.cholesky(blocks[cols]),
                                           indices_are_sorted=True)
            return f

        def trsm(sched):
            def f(blocks, ai):
                offs, od = sched[ai]
                X = jnp.swapaxes(
                    sb.solve_lower(blocks[od],
                                   jnp.swapaxes(blocks[offs], -1, -2)),
                    -1, -2,
                )
                return blocks.at[offs].set(X, indices_are_sorted=True)
            return f

        if fact.n_steps == 0:  # fully-dense tail: nothing streamed
            return blocks
        mk = {"upd": upd, "chol": chol, "trsm": trsm}
        branches = [mk[kind](jnp.asarray(arr)) for kind, arr in fact.branches]
        opcodes = jnp.asarray(fact.opcodes)
        arg_idx = jnp.asarray(fact.arg_idx)

        def body(i, blocks):
            return jax.lax.switch(opcodes[i], branches, blocks, arg_idx[i])

        return jax.lax.fori_loop(0, fact.n_steps, body, blocks)

    def _solve_stream(self, blocks, rhs, L_tail=None):
        """blocks: factorize output INCLUDING the two pad slots."""
        _, fwd, bwd = self._get_stream()
        y = jnp.concatenate(
            [rhs, jnp.zeros((1, self.b), rhs.dtype)], 0
        )

        def gemv(spec):
            def outer(sched):
                def f(y, ai):
                    dst, sblk, scol = sched[ai]
                    c = jnp.einsum(spec, blocks[sblk], y[scol],
                                   precision="highest")
                    c2, dst2 = _collapse_sorted(c, dst)
                    return y.at[dst2].add(-c2, indices_are_sorted=True)
                return f
            return outer

        def diag(solve):
            def outer(sched):
                def f(y, ai):
                    cb, cy = sched[ai]
                    return y.at[cy].set(
                        solve(blocks[cb], y[cy][..., None])[..., 0],
                        indices_are_sorted=True,
                    )
                return f
            return outer

        def run(stream, mk):
            if stream.n_steps == 0:  # fully-dense tail
                return y
            branches = [mk[kind](jnp.asarray(arr))
                        for kind, arr in stream.branches]
            opcodes = jnp.asarray(stream.opcodes)
            arg_idx = jnp.asarray(stream.arg_idx)

            def body(i, y):
                return jax.lax.switch(opcodes[i], branches, y, arg_idx[i])

            return jax.lax.fori_loop(0, stream.n_steps, body, y)

        y = run(fwd, {"gemv": gemv("mij,mj->mi"),
                      "diag": diag(sb.solve_lower)})
        y = self._tail_solve(y, L_tail)
        y = run(bwd, {"gemv": gemv("mji,mj->mi"),
                      "diag": diag(sb.solve_upper_from_lower)})
        return y[:-1]

    # ------------------------------------------------ factorization MEGA
    def _get_mega_sched(self, W: int = None):
        """Host schedule for the single-launch manual-DMA factorization
        kernel (ops/pallas_supernodal.factorize_mega): an (n_win, 6, W)
        int32 array of per-step rows (op, a1, a2, din, li, wd) — the four
        load indices (unused ones point at the Z zero row / Linv identity
        row) and the ext write target. Level layout [UPD* | NOP pad |
        CHOL* | NOP pad | TRSM* | NOP pad]: within a phase no block is
        both written and read, and the NOP spacers keep every cross-phase
        read >= _MEGA_PAD steps behind the write it depends on (the
        kernel's 1-step-lookahead DMA pipeline needs >= 3). UPD rows are
        dst-sorted per level; the host bakes run structure into the
        opcodes (UPD_FIRST loads the destination, the run-END step writes
        it — mid-run steps write the trash slot)."""
        from . import pallas_supernodal as psn

        if W is None:
            W = psn._MEGA_W
        if getattr(self, "_mega_sched", None) is not None \
                and self._mega_sched.shape[-1] == W:
            return self._mega_sched

        Z, T = self.n_blocks, self.n_blocks + 1  # ext pad rows
        LID = self.n                              # Linv identity row
        PAD = psn._MEGA_PAD
        NOP_ROW = (psn.OP_NOP, Z, Z, Z, LID, T)
        rows: list = []

        def nop(k=PAD):
            rows.extend([NOP_ROW] * k)

        for (u_dst, u_s1, u_s2), (cols, offs, offs_diag) in zip(
            self.upd_sched, self.col_sched
        ):
            if len(u_dst):
                order = np.argsort(u_dst, kind="stable")
                d = u_dst[order]
                s1 = u_s1[order]
                s2 = u_s2[order]
                m = len(d)
                for i in range(m):
                    first = i == 0 or d[i] != d[i - 1]
                    last = i == m - 1 or d[i] != d[i + 1]
                    rows.append((
                        psn.OP_UPD_FIRST if first else psn.OP_UPD_CONT,
                        s1[i], s2[i], d[i] if first else Z, LID,
                        d[i] if last else T,
                    ))
                nop()
            if len(cols):
                # chol QUADS: PRE stages panels (c1..c3, T-pads first — the
                # trash slot is a maintained identity, chol(I) = I exactly),
                # MAIN loads c4 (always real) and runs the 4 interleaved
                # recurrences, STASH1-3 flush the staged panels' results;
                # pad positions flush as NOPs
                cs = [int(c) for c in cols]
                i = 0
                while i < len(cs):
                    grp = cs[i:i + 4]
                    i += 4
                    pads = 4 - len(grp)
                    pre = ([T] * pads + grp[:-1])[:3]
                    main = grp[-1]
                    rows.append((psn.OP_CHOL4_PRE, pre[0], pre[1], pre[2],
                                 LID, T))
                    rows.append((psn.OP_CHOL4_MAIN, Z, Z, main, LID, main))
                    for k, c in enumerate(pre):
                        if c == T:
                            rows.append(NOP_ROW)
                        else:
                            rows.append((psn.OP_STASH1 + k, Z, Z, Z, LID, c))
                nop()
            if len(offs):
                for o, od in zip(offs, offs_diag):
                    rows.append((psn.OP_TRSM, Z, Z, o, od, o))
                nop()
        # pad to whole windows (trailing NOPs also leave ext[T] = I)
        nop(max(PAD, (-len(rows)) % W))
        if len(rows) % W:
            nop(W - len(rows) % W)
        arr = np.asarray(rows, np.int32).reshape(-1, W, 6)
        arr = arr.transpose(0, 2, 1)                    # (n_win, 6, W)
        # row dim padded 6 -> 8: Mosaic requires slices of the window axis
        # to be 8-aligned on the second-to-last dim
        arr = np.concatenate(
            [arr, np.zeros((arr.shape[0], 2, W), np.int32)], 1
        )
        self._mega_sched = np.ascontiguousarray(arr)
        return self._mega_sched

    def _factorize_mega(self, blocks):
        """ONE pallas launch for the whole numeric factorization — the
        dispatch-latency end-game on this backend (each launch ~2.5 ms,
        each XLA stream op ~0.4 ms; paying the launch cost once makes the
        ~45k-step schedule compute-bound instead of dispatch-bound).
        Returns (ext incl. pad slots [ext[T] = I], Linv (n+2, b, b))."""
        from . import pallas_supernodal as psn

        if blocks.dtype != jnp.float32:
            raise ValueError("mega mode is f32-only")
        b, n = self.b, self.n
        interp = jax.default_backend() != "tpu"
        eye = jnp.eye(b, dtype=jnp.float32)
        pad = jnp.stack([jnp.zeros((b, b), jnp.float32), eye])
        ext = jnp.concatenate([blocks, pad], 0)
        # Linv rows: [0..n) panel inverses, n identity (solve pads read
        # it), n+1 trash (the kernel's non-CHOL Linv writes land here)
        Linv = jnp.concatenate(
            [jnp.zeros((n, b, b), jnp.float32), eye[None],
             jnp.zeros((1, b, b), jnp.float32)], 0
        )
        pad = ((0, 0), (0, 0), (0, 128 - b))
        if not any(len(u[0]) or len(c[0]) for u, c in
                   zip(self.upd_sched, self.col_sched)):
            # fully-dense tail: nothing streamed (keep the padded layout)
            return jnp.pad(ext, pad), jnp.pad(Linv, pad)
        sched = self._get_mega_sched(getattr(self, "_mega_W", None))
        return psn.factorize_mega(ext, Linv, sched, interpret=interp)

    # ------------------------------------------------------ solve MEGA
    def _get_mega_solve_sched(self, W: int = None):
        """Host schedules for the single-launch solve sweeps
        (ops/pallas_supernodal.solve_mega): (fwd, bwd) arrays of shape
        (n_win, 8, W) int32, rows (op, ext, linv, ysrc, ydst, wd, 0, 0).
        Per level: [GEMV runs | NOP pad | DIAG | NOP pad] (bwd in reversed
        level order). Same hazard discipline as the factorization schedule;
        the row-vector y rides as (n+1, 8, 128) tiles with trash row n."""
        from . import pallas_supernodal as psn

        if W is None:
            W = psn._MEGA_W
        if getattr(self, "_mega_solve_sched", None) is not None \
                and self._mega_solve_sched[0].shape[-1] == W:
            return self._mega_solve_sched

        Z = self.n_blocks        # ext zero row (unused operand target)
        LID = self.n             # Linv identity row
        TY = self.n              # y trash row
        PAD = psn._MEGA_PAD
        NOP_ROW = (psn.SOP_NOP, Z, LID, TY, TY, TY)

        def build(level_iter, sched_of):
            rows: list = []

            def nop(k=PAD):
                rows.extend([NOP_ROW] * k)

            for li in level_iter:
                dst, sblk, scol = sched_of(li)
                if len(dst):
                    order = np.argsort(dst, kind="stable")
                    d, sb_, sc = dst[order], sblk[order], scol[order]
                    m = len(d)
                    for i in range(m):
                        first = i == 0 or d[i] != d[i - 1]
                        last = i == m - 1 or d[i] != d[i + 1]
                        rows.append((
                            psn.SOP_GEMV_FIRST if first
                            else psn.SOP_GEMV_CONT,
                            sb_[i], LID, sc[i], d[i] if first else TY,
                            d[i] if last else TY,
                        ))
                    nop()
                cols = self.col_sched[li][0]
                if len(cols):
                    for c in cols:
                        rows.append((psn.SOP_DIAG, Z, c, c, TY, c))
                    nop()
            nop(max(PAD, (-len(rows)) % W))
            if len(rows) % W:
                nop(W - len(rows) % W)
            arr = np.asarray(rows, np.int32).reshape(-1, W, 6)
            arr = arr.transpose(0, 2, 1)
            arr = np.concatenate(
                [arr, np.zeros((arr.shape[0], 2, W), np.int32)], 1)
            return np.ascontiguousarray(arr)

        L = len(self.levels)
        fwd = build(range(L), lambda li: self.fwd_sched[li])
        bwd = build(reversed(range(L)), lambda li: self.bwd_sched[li])
        self._mega_solve_sched = (fwd, bwd)
        return self._mega_solve_sched

    def _solve_mega(self, factor, rhs, L_tail=None):
        """Forward/backward sweeps as ONE pallas launch each, against the
        lane-padded mega factor; the dense tail solve runs between them in
        XLA. rhs (n, b) -> x (n, b)."""
        from . import pallas_supernodal as psn

        ext_p, Linv_p = factor
        interp = jax.default_backend() != "tpu"
        n, b = self.n, self.b
        W = getattr(self, "_mega_W", None)
        fwd, bwd = self._get_mega_solve_sched(W)
        have_stream = any(
            len(f[0]) or len(c[0])
            for f, c in zip(self.fwd_sched, self.col_sched)
        )
        y = jnp.zeros((n + 1, 8, 128), jnp.float32)
        y = y.at[:n, 0, :b].set(rhs)
        if have_stream:
            y = psn.solve_mega(ext_p, Linv_p, y, fwd, trans=False,
                               interpret=interp)
        if L_tail is not None:
            yv = self._tail_solve(y[:, 0, :b], L_tail)
            y = y.at[:, 0, :b].set(yv)
        if have_stream:
            y = psn.solve_mega(ext_p, Linv_p, y, bwd, trans=True,
                               interpret=interp)
        return y[:n, 0, :b]

    # --------------------------------------------- selected-inverse MEGA
    def _get_mega_sel_sched(self, W: int = None):
        """Host schedule for the single-launch blocked-Takahashi selected
        inverse (ops/pallas_supernodal.selected_inverse_mega): (n_win, 8, W)
        int32 rows (op, a1, a2, li, wd, 0, 0, 0). REVERSE level order; per
        level the phases are [per-(i,j) ACC runs + FIN_OFF | NOP pad |
        per-j diag ACC runs + FIN_DIAG/DIAG0 | NOP pad]: phase-1 writes
        (S_ij, column j in this level) are only read by phase 2, and
        phase-2 writes (S_jj) only by later (lower) levels — every such
        read sits >= _MEGA_PAD steps behind its write, which the kernel's
        1-step-lookahead DMA pipeline requires (>= 3). Returns None when no
        stream columns exist (fully-dense tail)."""
        from . import pallas_supernodal as psn

        if W is None:
            W = psn._MEGA_W
        cached = getattr(self, "_mega_sel_sched", None)
        if cached is not None and (
                cached is False or cached.shape[-1] == W):
            return None if cached is False else cached

        struct, off_id = self.struct, self.off_id
        Z, T = self.n_blocks, self.n_blocks + 1
        LID = self.n             # Linv identity row (unused lin loads)
        PAD = psn._MEGA_PAD
        NOP_ROW = (psn.XOP_NOP, Z, Z, LID, T)
        rows: list = []

        def nop(k=PAD):
            rows.extend([NOP_ROW] * k)

        for lv in reversed(self.levels):
            scols = [j for j in lv if j < self.ns]
            ph1 = False
            for j in scols:
                c = struct[j]
                for i in c:
                    first = True
                    for k in c:
                        if i == k:
                            sid, tr = int(k), False
                        elif i > k:
                            sid, tr = off_id[(int(i), int(k))], False
                        else:
                            sid, tr = off_id[(int(k), int(i))], True
                        op = ((psn.XOP_ACC_FT if tr else psn.XOP_ACC_FN)
                              if first else
                              (psn.XOP_ACC_T if tr else psn.XOP_ACC_N))
                        first = False
                        rows.append((op, sid, off_id[(int(k), j)], LID, T))
                    rows.append((psn.XOP_FIN_OFF, Z, Z, int(j),
                                 off_id[(int(i), j)]))
                    ph1 = True
            if ph1:
                nop()
            ph2 = False
            for j in scols:
                c = struct[j]
                if len(c) == 0:
                    rows.append((psn.XOP_DIAG0, Z, Z, int(j), int(j)))
                else:
                    first = True
                    for i in c:
                        oid = off_id[(int(i), j)]
                        rows.append((
                            psn.XOP_ACC_FT if first else psn.XOP_ACC_T,
                            oid, oid, LID, T))
                        first = False
                    rows.append((psn.XOP_FIN_DIAG, Z, Z, int(j), int(j)))
                ph2 = True
            if ph2:
                nop()
        if not rows:
            self._mega_sel_sched = False
            return None
        nop(max(PAD, (-len(rows)) % W))
        if len(rows) % W:
            nop(W - len(rows) % W)
        arr = np.asarray(rows, np.int32).reshape(-1, W, 5)
        arr = arr.transpose(0, 2, 1)                    # (n_win, 5, W)
        arr = np.concatenate(
            [arr, np.zeros((arr.shape[0], 3, W), np.int32)], 1)
        self._mega_sel_sched = np.ascontiguousarray(arr)
        return self._mega_sel_sched

    def _selected_inverse_mega(self, factor, L_tail=None):
        """Selected inverse off the mega factor as ONE pallas launch —
        identical math to the XLA Takahashi loop in `selected_inverse` but
        with compile cost O(1) in level count (the unrolled XLA program
        costs ~28 min of compile at 10k states vs ~20 s here; measured
        round 5). Every TRSM of the recurrence becomes a GEMM against the
        panel-inverse table the mega factorization already maintains.
        Returns S in the unpadded (n_blocks, b, b) storage layout."""
        from . import pallas_supernodal as psn

        ext_p, Linv_p = factor
        b, n = self.b, self.n
        interp = jax.default_backend() != "tpu"
        NE = self.n_blocks + 2
        S = jnp.zeros((NE, b, 128), jnp.float32)
        if L_tail is not None:
            nt = self.n_tail
            Linv_t = jax.scipy.linalg.solve_triangular(
                L_tail, jnp.eye(nt * b, dtype=jnp.float32), lower=True
            )
            S_dense = sb.matmul_hp(jnp.swapaxes(Linv_t, -1, -2), Linv_t)
            S4 = S_dense.reshape(nt, b, nt, b).transpose(0, 2, 1, 3)
            t_ids, t_ri, t_rj = self._tail_map
            S = S.at[jnp.asarray(t_ids), :, :b].set(
                S4[jnp.asarray(t_ri), jnp.asarray(t_rj)]
            )
        sched = self._get_mega_sel_sched(getattr(self, "_mega_W", None))
        if sched is not None:
            S = psn.selected_inverse_mega(ext_p, Linv_p, S, sched,
                                          interpret=interp)
        return S[: self.n_blocks, :, :b]

    # -------------------------------------- pallas_stream gather-GEMM mode
    def _factorize_pallas_stream(self, blocks):
        """The chunked instruction stream (compile O(1) in levels) with its
        UPD/TRSM steps executed as gather-GEMM pallas kernels — the fusion
        of mode="stream"'s compile behavior with mode="pallas"'s per-chunk
        latency (one kernel instead of an XLA gather->matmul->scatter
        chain per chunk; the chunk index slices ride as runtime
        scalar-prefetch operands). CHOL steps stay XLA and maintain the Linv
        panel-inverse table the TRSM/DIAG kernels contract against.
        Returns (ext blocks incl. pad slots, Linv)."""
        from . import pallas_supernodal as psn

        if blocks.dtype != jnp.float32:
            raise ValueError("pallas_stream mode is f32-only")
        fact, _, _ = self._get_stream(pallas=True)
        b, n = self.b, self.n
        interp = jax.default_backend() != "tpu"
        eye = jnp.eye(b, dtype=jnp.float32)
        pad = jnp.stack([jnp.zeros((b, b), jnp.float32), eye])
        ext = jnp.concatenate([blocks, pad], 0)
        Linv = jnp.concatenate(
            [jnp.zeros((n, b, b), jnp.float32), eye[None]], 0
        )
        if fact.n_steps == 0:  # fully-dense tail
            return ext, Linv

        def upd(sched):
            def f(carry, ai):
                ext, Linv = carry
                dst, s1, s2 = sched[ai]
                ext = psn.gather_gemm(ext, ext, ext, s1, s2, dst,
                                      op="mm_bt", combine="acc_sub",
                                      interpret=interp)
                return (ext, Linv)
            return f

        def chol(sched):
            def f(carry, ai):
                ext, Linv = carry
                cols = sched[ai][0]
                Ld = sb.cholesky(ext[cols])
                ext = ext.at[cols].set(Ld, indices_are_sorted=True)
                Li = sb.solve_lower(Ld, jnp.broadcast_to(eye, Ld.shape))
                # pad cols (= T > n) land on the Linv identity trash row n:
                # chol(I)=I, I^{-1}=I — an exact no-op write
                Linv = Linv.at[jnp.minimum(cols, n)].set(
                    Li, indices_are_sorted=True)
                return (ext, Linv)
            return f

        def trsm(sched):
            def f(carry, ai):
                ext, Linv = carry
                offs, od = sched[ai]
                ext = psn.gather_gemm(ext, Linv, ext, offs, od, offs,
                                      op="mm_bt", combine="set",
                                      interpret=interp)
                return (ext, Linv)
            return f

        mk = {"upd": upd, "chol": chol, "trsm": trsm}
        branches = [mk[kind](jnp.asarray(arr)) for kind, arr in fact.branches]
        opcodes = jnp.asarray(fact.opcodes)
        arg_idx = jnp.asarray(fact.arg_idx)

        def body(i, carry):
            return jax.lax.switch(opcodes[i], branches, carry, arg_idx[i])

        return jax.lax.fori_loop(0, fact.n_steps, body, (ext, Linv))

    def _solve_pallas_stream(self, factor, rhs, L_tail=None):
        """Streamed solves as gather-GEMM kernels; rhs rides as (n+1, b, 8)
        thin panels (column 0 real, row n trash) like _solve_pallas."""
        from . import pallas_supernodal as psn

        ext, Linv = factor
        _, fwd, bwd = self._get_stream(pallas=True)
        interp = jax.default_backend() != "tpu"
        n, b = self.n, self.b
        y = jnp.zeros((n + 1, b, 8), jnp.float32)
        y = y.at[:n, :, 0].set(rhs)

        def gemv(op):
            def outer(sched):
                def f(y, ai):
                    dst, sblk, scol = sched[ai]
                    return psn.gather_gemm(ext, y, y, sblk, scol, dst,
                                           op=op, combine="acc_sub",
                                           interpret=interp)
                return f
            return outer

        def diag(op):
            def outer(sched):
                def f(y, ai):
                    cb, cy = sched[ai]
                    return psn.gather_gemm(Linv, y, y, cb, cy, cy,
                                           op=op, combine="set",
                                           interpret=interp)
                return f
            return outer

        def run(stream, mk):
            if stream.n_steps == 0:
                return y
            branches = [mk[kind](jnp.asarray(arr))
                        for kind, arr in stream.branches]
            opcodes = jnp.asarray(stream.opcodes)
            arg_idx = jnp.asarray(stream.arg_idx)

            def body(i, y):
                return jax.lax.switch(opcodes[i], branches, y, arg_idx[i])

            return jax.lax.fori_loop(0, stream.n_steps, body, y)

        y = run(fwd, {"gemv": gemv("mm"), "diag": diag("mm")})
        if L_tail is not None:
            y = y.at[:, :, 0].set(self._tail_solve(y[:, :, 0], L_tail))
        y = run(bwd, {"gemv": gemv("mm_t"), "diag": diag("mm_t")})
        return y[:n, :, 0]

    # ------------------------------------------- pallas gather-GEMM mode
    def _get_pallas_sched(self):
        """Per-level index tables for the gather-GEMM kernels, sorted by
        destination and padded to bucket sizes with trash rows (block ids
        Z/T, rhs row TY, Linv row TY=n which holds the identity)."""
        if self._pallas_sched is not None:
            return self._pallas_sched
        from . import pallas_supernodal as psn

        Z, T, TY = self.n_blocks, self.n_blocks + 1, self.n

        def padded(rows, pad_row):
            rows = np.asarray(rows, np.int64)
            if rows.size:
                rows = rows.reshape(rows.shape[0], -1)
                rows = rows[np.argsort(rows[:, 0], kind="stable")]
            else:
                rows = np.zeros((0, len(pad_row)), np.int64)
            C = psn.bucket(max(len(rows), 1))
            pad = np.tile(np.asarray(pad_row, np.int64)[None],
                          (C - len(rows), 1))
            out = np.concatenate([rows, pad], 0).astype(np.int32)
            return tuple(out[:, k] for k in range(out.shape[1]))

        sched = []
        for li in range(len(self.levels)):
            u = self.upd_sched[li]
            c = self.col_sched[li]
            f = self.fwd_sched[li]
            bw = self.bwd_sched[li]
            lv = {
                "upd": padded(np.stack(u, 1), (T, Z, Z)) if len(u[0]) else None,
                "cols": np.asarray(c[0], np.int32),
                "trsm": (padded(np.stack([c[1], c[2]], 1), (T, TY))
                         if len(c[1]) else None),
                "fwd": (padded(np.stack(f, 1), (TY, Z, TY))
                        if len(f[0]) else None),
                "diag": (padded(np.stack([c[0], c[0]], 1), (TY, TY))
                         if len(c[0]) else None),
                "bwd": (padded(np.stack(bw, 1), (TY, Z, TY))
                        if len(bw[0]) else None),
            }
            sched.append(lv)
        self._pallas_sched = sched
        return sched

    def _factorize_pallas(self, blocks):
        """Per-level: ONE gather-GEMM-accumulate kernel for the updates,
        batched blocked Cholesky + panel inverses (XLA), ONE gather-GEMM
        kernel for the TRSMs (X = A L^{-T} against the inverse table).
        Returns (padded blocks, Linv table)."""
        from . import pallas_supernodal as psn

        if blocks.dtype != jnp.float32:
            raise ValueError("pallas mode is f32-only")
        b = self.b
        interp = jax.default_backend() != "tpu"
        eye = jnp.eye(b, dtype=jnp.float32)
        pad = jnp.stack([jnp.zeros((b, b), jnp.float32), eye])
        ext = jnp.concatenate([blocks, pad], 0)
        Linv = jnp.concatenate(
            [jnp.zeros((self.n, b, b), jnp.float32), eye[None]], 0
        )
        for lv in self._get_pallas_sched():
            if lv["upd"] is not None:
                dst, s1, s2 = lv["upd"]
                ext = psn.gather_gemm(ext, ext, ext, s1, s2, dst,
                                      op="mm_bt", combine="acc_sub",
                                      interpret=interp)
            cols = lv["cols"]
            if len(cols):
                Ld = sb.cholesky(ext[cols])
                ext = ext.at[cols].set(Ld, indices_are_sorted=True)
                Li = sb.solve_lower(Ld, jnp.broadcast_to(eye, Ld.shape))
                Linv = Linv.at[cols].set(Li, indices_are_sorted=True)
            if lv["trsm"] is not None:
                off, od = lv["trsm"]
                ext = psn.gather_gemm(ext, Linv, ext, off, od, off,
                                      op="mm_bt", combine="set",
                                      interpret=interp)
        return ext, Linv

    def _solve_pallas(self, factor, rhs, L_tail=None):
        """Forward/backward sweeps as gather-GEMM kernels; right-hand sides
        ride as (n+1, b, 8) thin panels (column 0 real, row n trash)."""
        from . import pallas_supernodal as psn

        ext, Linv = factor
        interp = jax.default_backend() != "tpu"
        n, b = self.n, self.b
        y = jnp.zeros((n + 1, b, 8), jnp.float32)
        y = y.at[:n, :, 0].set(rhs)
        sched = self._get_pallas_sched()
        for lv in sched:
            if lv["fwd"] is not None:
                dst, sblk, scol = lv["fwd"]
                y = psn.gather_gemm(ext, y, y, sblk, scol, dst,
                                    op="mm", combine="acc_sub",
                                    interpret=interp)
            if lv["diag"] is not None:
                d, a = lv["diag"]
                y = psn.gather_gemm(Linv, y, y, a, d, d,
                                    op="mm", combine="set", interpret=interp)
        if L_tail is not None:
            yt = self._tail_solve(y[:, :, 0], L_tail)
            y = y.at[:, :, 0].set(yt)
        for lv in reversed(sched):
            if lv["bwd"] is not None:
                dst, sblk, scol = lv["bwd"]
                y = psn.gather_gemm(ext, y, y, sblk, scol, dst,
                                    op="mm_t", combine="acc_sub",
                                    interpret=interp)
            if lv["diag"] is not None:
                d, a = lv["diag"]
                y = psn.gather_gemm(Linv, y, y, a, d, d,
                                    op="mm_t", combine="set",
                                    interpret=interp)
        return y[:n, :, 0]

    # ------------------------------------------------------- dense tail
    def _tail_dense_factor(self, blocks):
        """Gather the fully-updated tail blocks into one dense
        (n_tail*b, n_tail*b) SPD matrix and Cholesky-factorize it — the
        MXU-shaped replacement for the deepest separator levels."""
        t_ids, t_ri, t_rj = self._tail_map
        nt, b = self.n_tail, self.b
        gathered = blocks[jnp.asarray(t_ids)]
        if gathered.shape[-1] != b:  # lane-padded mega factor
            gathered = gathered[..., :b]
        M4 = jnp.zeros((nt, nt, b, b), blocks.dtype)
        M4 = M4.at[jnp.asarray(t_ri), jnp.asarray(t_rj)].set(gathered)
        M = M4.transpose(0, 2, 1, 3).reshape(nt * b, nt * b)
        # blocks store the lower triangle (i >= j); mirror it
        M = jnp.tril(M) + jnp.tril(M, -1).T
        return jnp.linalg.cholesky(M)

    def _tail_solve(self, y, L_tail):
        """Dense forward+backward solve on the tail rows of y, between the
        streamed forward and backward passes."""
        if L_tail is None:
            return y
        ns, nt, b = self.ns, self.n_tail, self.b
        yt = y[ns : ns + nt].reshape(nt * b)
        z = jax.scipy.linalg.solve_triangular(L_tail, yt, lower=True)
        xt = jax.scipy.linalg.solve_triangular(L_tail.T, z, lower=False)
        return y.at[ns : ns + nt].set(xt.reshape(nt, b))

    def factorize(self, blocks):
        """A -> L over the level schedules. In stream mode the result keeps
        two extra pad slots (zero + identity) consumed by the stream solve;
        slice [:n_blocks] to compare against the unrolled factor. In pallas
        mode the factor is (padded blocks, panel-inverse table). With a
        dense tail, returns (factor, L_tail)."""
        if self._mode == "pallas":
            blocks = self._factorize_pallas(blocks)
        elif self._mode == "pallas_stream":
            blocks = self._factorize_pallas_stream(blocks)
        elif self._mode == "mega":
            blocks = self._factorize_mega(blocks)
        elif self._mode == "stream":
            blocks = self._factorize_stream(blocks)
        else:
            blocks = self._factorize_unrolled(blocks)
        if self.n_tail:
            tail_src = (blocks[0]
                        if self._mode in ("pallas", "pallas_stream", "mega")
                        else blocks)
            return blocks, self._tail_dense_factor(tail_src)
        return blocks

    def solve_factored(self, blocks, rhs):
        """rhs (n, b) in elimination positions -> x (n, b)."""
        L_tail = None
        if self.n_tail:
            blocks, L_tail = blocks
        if self._mode == "pallas":
            return self._solve_pallas(blocks, rhs, L_tail)
        if self._mode == "pallas_stream":
            return self._solve_pallas_stream(blocks, rhs, L_tail)
        if self._mode == "mega":
            # single-launch fwd/bwd sweeps against the lane-padded factor
            return self._solve_mega(blocks, rhs, L_tail)
        if self._mode == "stream":
            return self._solve_stream(blocks, rhs, L_tail)
        return self._solve_unrolled(blocks, rhs, L_tail)

    def _factorize_unrolled(self, blocks):
        """In-place left-looking level-batched factorization: A -> L."""
        for (u_dst, u_s1, u_s2), (cols, offs, offs_diag) in zip(
            self.upd_sched, self.col_sched
        ):
            if len(u_dst):
                upd = sb.matmul_hp(
                    blocks[u_s1], jnp.swapaxes(blocks[u_s2], -1, -2)
                )
                blocks = blocks.at[u_dst].add(-upd)
            if not len(cols):
                continue
            Ld = sb.cholesky(blocks[cols])
            blocks = blocks.at[cols].set(Ld)
            if len(offs):
                # L[i,j] = A[i,j] (L[j,j])^{-T}: X = solve_lower(Ljj, B^T)^T
                B = blocks[offs]
                Ljj = blocks[offs_diag]
                X = jnp.swapaxes(
                    sb.solve_lower(Ljj, jnp.swapaxes(B, -1, -2)), -1, -2
                )
                blocks = blocks.at[offs].set(X)
        return blocks

    def _solve_unrolled(self, blocks, rhs, L_tail=None):
        y = rhs
        for (dst, src_blk, src_col), (cols, _, _) in zip(
            self.fwd_sched, self.col_sched
        ):
            if len(dst):
                contrib = jnp.einsum(
                    "mij,mj->mi", blocks[src_blk], y[src_col],
                    precision="highest",
                )
                y = y.at[dst].add(-contrib)
            if len(cols):
                y = y.at[cols].set(
                    sb.solve_lower(blocks[cols], y[cols][..., None])[..., 0]
                )
        x = self._tail_solve(y, L_tail)
        for li in reversed(range(len(self.levels))):
            dst, src_blk, src_col = self.bwd_sched[li]
            cols = self.col_sched[li][0]
            if len(dst):
                contrib = jnp.einsum(
                    "mji,mj->mi", blocks[src_blk], x[src_col],
                    precision="highest",
                )
                x = x.at[dst].add(-contrib)
            if len(cols):
                x = x.at[cols].set(
                    sb.solve_upper_from_lower(
                        blocks[cols], x[cols][..., None]
                    )[..., 0]
                )
        return x

    # ------------------------------------------- selected inverse (S12)
    def _build_selected_schedules(self):
        """Static per-level schedules for the blocked Takahashi recurrence.

        Processing columns j in REVERSE level order (root first), with
        c = struct(j) (strict ancestors, already finalized):
          A)  T_ij = sum_{k in c} S_ik L_kj            (i in c)
          B)  S_cj = -T_cj L_jj^{-1}
          C)  T_jj = sum_{k in c} S_kj^T L_kj
          D)  S_jj = L_jj^{-T} L_jj^{-1} - T_jj L_jj^{-1}   (symmetrized)
        Validity relies on the symbolic-fill closure property: i, k in
        struct(j) with i > k implies (i, k) is in the factor pattern —
        guaranteed by the elimination construction in order.symbolic_factor.
        """
        struct, off_id = self.struct, self.off_id
        self._sel_sched = []
        for lv in self.levels:
            dstA, s1, tr, s2, col_slot = [], [], [], [], []
            # tail columns are seeded from the dense tail inverse; the
            # recurrence only runs on stream columns (aligned with
            # col_sched's filtered cols)
            for jj, j in enumerate([j for j in lv if j < self.ns]):
                c = struct[j]
                for i in c:
                    col_slot.append(jj)
                    for k in c:
                        if i == k:
                            sid, t = int(k), False
                        elif i > k:
                            sid, t = off_id[(int(i), int(k))], False
                        else:
                            sid, t = off_id[(int(k), int(i))], True
                        dstA.append(off_id[(int(i), j)])
                        s1.append(sid)
                        tr.append(t)
                        s2.append(off_id[(int(k), j)])
            self._sel_sched.append((
                np.asarray(dstA, np.int32), np.asarray(s1, np.int32),
                np.asarray(tr, bool), np.asarray(s2, np.int32),
                np.asarray(col_slot, np.int32),
            ))

    def selected_inverse(self, L):
        """Selected inverse of H = L L^T on the factor's block pattern.

        L is the output of `factorize`; returns S with the same storage
        layout (diag blocks [0..n), off blocks at off_id) — every block of
        H^{-1} that lies inside the fill pattern, which includes all
        per-variable marginal covariances (GTSAM Marginals semantics,
        SURVEY.md §2.2 S12 / §3.5) without ever forming H^{-1}.
        """
        if not hasattr(self, "_sel_sched"):
            self._build_selected_schedules()
        swap = lambda A: jnp.swapaxes(A, -1, -2)  # noqa: E731
        L_tail = None
        if self.n_tail:
            L, L_tail = L
        if (self._mode == "mega" and isinstance(L, tuple)
                and L[0].shape[-1] == 128):
            # mega factor: single-launch blocked-Takahashi kernel (same
            # math, O(1)-in-levels compile)
            return self._selected_inverse_mega(L, L_tail)
        if isinstance(L, tuple):  # pallas/mega factor: (ext, Linv)
            L = L[0][: self.n_blocks]
            if L.shape[-1] != self.b:  # lane-padded mega factor
                L = L[..., : self.b]
        S = jnp.zeros_like(L)
        if L_tail is not None:
            # seed every tail-pattern block of H^{-1} from the dense tail:
            # S_tail = L_tail^{-T} L_tail^{-1} (exact — the tail rows/cols
            # of H^{-1} restricted to the pattern)
            nt, b = self.n_tail, self.b
            Linv_t = jax.scipy.linalg.solve_triangular(
                L_tail, jnp.eye(nt * b, dtype=L.dtype), lower=True
            )
            S_dense = sb.matmul_hp(swap(Linv_t), Linv_t)
            S4 = S_dense.reshape(nt, b, nt, b).transpose(0, 2, 1, 3)
            t_ids, t_ri, t_rj = self._tail_map
            S = S.at[jnp.asarray(t_ids)].set(
                S4[jnp.asarray(t_ri), jnp.asarray(t_rj)]
            )
        eye = jnp.eye(self.b, dtype=L.dtype)
        for li in reversed(range(len(self.levels))):
            cols, offs, offs_diag = self.col_sched[li]
            if not len(cols):
                continue
            dstA, s1, tr, s2, col_slot = self._sel_sched[li]
            Ljj = L[cols]
            Linv = sb.solve_lower(Ljj, jnp.broadcast_to(eye, Ljj.shape))
            Sjj = sb.matmul_hp(swap(Linv), Linv)
            if len(offs):
                if len(dstA):
                    Sik = S[s1]
                    Sik = jnp.where(jnp.asarray(tr)[:, None, None],
                                    swap(Sik), Sik)
                    S = S.at[dstA].add(sb.matmul_hp(Sik, L[s2]))
                T = S[offs]
                Scj = -swap(sb.solve_upper_from_lower(L[offs_diag], swap(T)))
                S = S.at[offs].set(Scj)
                contrib = sb.matmul_hp(swap(Scj), L[offs])
                Tjj = jax.ops.segment_sum(contrib, jnp.asarray(col_slot),
                                          num_segments=len(cols))
                Sjj = Sjj - swap(sb.solve_upper_from_lower(Ljj, swap(Tjj)))
            Sjj = 0.5 * (Sjj + swap(Sjj))
            S = S.at[cols].set(Sjj)
        return S

    def diag_marginals(self, S, graph):
        """Per-variable (d, d) tangent marginal covariances from a selected
        inverse: {group: (N_g, d_g, d_g)}."""
        pos = jnp.asarray(self.pos)
        out = {}
        for grp in self.groups:
            o = self.group_offset[grp]
            nn = self.group_sizes[grp]
            d = graph.manifolds[grp].dim
            out[grp] = S[pos[o : o + nn], :d, :d]
        return out

    def joint_marginal_pairs(self, S, graph, pairs):
        """Pairwise joint tangent covariances from a selected inverse, for
        variable pairs INSIDE the fill pattern (any two variables that share
        a factor are, plus all fill-in pairs) — the GTSAM
        `jointMarginalCovariance` case that matters on general sparse
        graphs, at zero extra numeric cost after `selected_inverse`.

        pairs: sequence of ((group_i, idx_i), (group_j, idx_j)).
        Returns a list of (d_i + d_j, d_i + d_j) arrays
        [[S_ii, S_ij], [S_ij^T, S_jj]]. Raises ValueError for a pair
        outside the pattern (use marginals.dense_marginals-style fallback).
        A pair naming the same variable twice degrades to the duplicated
        marginal [[S_ii, S_ii], [S_ii, S_ii]] (GTSAM jointMarginalCovariance
        semantics for repeated keys).
        """
        out = []
        for (ga, ia), (gb, ib) in pairs:
            da = graph.manifolds[ga].dim
            db = graph.manifolds[gb].dim
            pa = int(self.pos[self.group_offset[ga] + int(ia)])
            pb = int(self.pos[self.group_offset[gb] + int(ib)])
            Saa = S[pa, :da, :da]
            Sbb = S[pb, :db, :db]
            if pa == pb:
                top = jnp.concatenate([Saa, Saa], axis=-1)
                out.append(jnp.concatenate([top, top], axis=-2))
                continue
            key = (max(pa, pb), min(pa, pb))
            if key not in self.off_id:
                raise ValueError(
                    f"pair {((ga, int(ia)), (gb, int(ib)))} is outside the "
                    f"fill pattern; no selected-inverse block exists — use "
                    f"the dense fallback for out-of-pattern joints"
                )
            blk = S[self.off_id[key]]
            Sab = (blk[:da, :db] if pa > pb
                   else jnp.swapaxes(blk[:db, :da], -1, -2))
            top = jnp.concatenate([Saa, Sab], axis=-1)
            bot = jnp.concatenate([jnp.swapaxes(Sab, -1, -2), Sbb], axis=-1)
            out.append(jnp.concatenate([top, bot], axis=-2))
        return out

    @property
    def solver(self):
        """lm_solve-compatible: solver(graph, values, lins, lam) -> delta."""
        pos = jnp.asarray(self.pos)

        def _solve(graph, values, lins, lam):
            blocks, g = self.assemble(graph, lins, values, lam)
            L = self.factorize(blocks)
            x = self.solve_factored(L, -g)  # (n, b) in elimination positions
            x_var = x[pos]  # by global variable id
            out = {}
            for grp in self.groups:
                o = self.group_offset[grp]
                nn = self.group_sizes[grp]
                d = graph.manifolds[grp].dim
                out[grp] = x_var[o : o + nn, :d]
            return out

        return _solve
