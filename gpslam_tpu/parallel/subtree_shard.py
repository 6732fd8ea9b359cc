"""Subtree-pipelined sparse Cholesky over the device mesh (SURVEY.md §2.4 P3:
"independent subtrees of the elimination tree on different chips; parent
frontal reduction = psum up the tree").

The P2 solver (supernodal_shard.py) splits each elimination LEVEL's update
work across devices — one psum per level, global etree depth on every chip.
This module implements the orthogonal decomposition the survey's P3 row asks
for: a two-level multifrontal partition of the elimination tree itself.

  - The TOP of the tree (the trailing separator positions under a nested-
    dissection ordering) becomes the solver's dense tail: one replicated
    MXU Cholesky (ops/supernodal.py `dense_tail`). The tail is grown until
    removing it leaves >= 2x n_shards INDEPENDENT subtrees.
  - Each remaining subtree (an etree component closed under descendants) is
    assigned wholesale to one device by LPT on its estimated update work.
    A device eliminates its subtrees with ZERO communication — its columns'
    updates, Cholesky panels and TRSMs touch only blocks inside the
    component plus additive Schur contributions onto tail blocks.
  - Parent frontal reduction = ONE psum of the block-storage delta after all
    local eliminations (cross-device blocks are disjoint; tail Schur
    contributions are additive), then the replicated dense-tail Cholesky.
    Total per-factorization communication: 1 psum — vs one per level in P2.
  - Triangular solves use the same partition: local forward sweep, delta
    psum, replicated dense tail solve, local backward sweep, delta psum.

Per-chip sequential depth is the deepest subtree ACROSS devices (the
stacked schedules run in SPMD lockstep over max-over-devices local depth) —
still far shallower than the global etree, which is the latency win nested
dissection buys. Scales to multi-host by widening the mesh axis (the psum
rides ICI within a slice).

Schedules are per-device stacked arrays (leading axis = device), padded per
level with trash slots: block ids Z (zeros) / T (identity) and rhs row TY
(zero), so padded lanes compute exact no-ops inside one shard_map program.
Each device-level list is SORTED by destination and collapsed with a sorted
segment-sum before its scatter (colliding-index scatters serialize on TPU).

mode="stream" (auto beyond ops.supernodal._STREAM_LEVELS levels) runs the
local eliminations as a device-side chunked instruction stream — the same
opcode/chunk machinery as the single-device solver, with every schedule
array carrying a leading device axis selected by `axis_index` inside the
kernel — so compile time is O(1) in subtree depth while the communication
structure (ONE delta psum + replicated MXU dense tail) is unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LMConfig
from ..graph import graph as graphlib
from ..ops import order as order_mod
from ..ops import smallblock as sb
from ..ops import supernodal as supernodal_mod
from ..ops.supernodal import _Stream, _collapse_sorted, _run_ordering
from .mesh import global_put, make_mesh
from .solve import _stats_struct, pad_graph
from .supernodal_shard import ShardedSupernodalSolver


def _choose_tail(parent: np.ndarray, n_shards: int, tail_cap: int) -> int:
    """Smallest trailing block whose removal leaves >= 2*n_shards independent
    etree subtrees (grown by doubling; capped so the dense tail stays
    MXU-sized). With fewer components than that at the cap, accept the cap —
    some devices idle, correctness unaffected."""
    n = len(parent)
    cap = max(1, min(tail_cap, n - 1))
    t = 1
    while t < cap:
        ns = n - t
        n_roots = int(np.sum((parent[:ns] < 0) | (parent[:ns] >= ns)))
        if n_roots >= 2 * n_shards:
            return t
        t = min(2 * t, cap)
    return cap


class SubtreeShardedSolver(ShardedSupernodalSolver):
    """SupernodalSolver + per-device subtree elimination schedules.

    Build on the PADDED graph (factor counts divisible by n_shards).
    `factorize_subtree` / `solve_subtree` run inside a shard_map region over
    `axis_name`; assembly sharding (`assemble_local`) is inherited from the
    P2 class.
    """

    def __init__(self, graph, values, n_shards: int, ordering: str = "nd",
                 tail_cap: int = 256, mode: str = "auto"):
        # pre-analysis: the tail must be chosen BEFORE the base class builds
        # its schedules, so run the (host-side) symbolic pass once here and
        # thread it into the base constructor (no duplicate symbolic pass)
        indptr, indices, _ = order_mod.adjacency_from_graph(graph, values)
        perm = _run_ordering(indptr, indices, ordering)
        struct, parent, _fill = order_mod.symbolic_factor(
            indptr, indices, perm)
        n_tail = _choose_tail(parent, n_shards, tail_cap)
        super().__init__(graph, values, n_shards, ordering=ordering,
                         mode="unrolled", dense_tail=n_tail,
                         _symbolic=(perm, struct, parent))
        self._build_subtree_schedules(parent)
        if mode == "auto":
            mode = ("stream" if self.n_sub_levels > supernodal_mod._STREAM_LEVELS
                    else "unrolled")
        if mode not in ("unrolled", "stream"):
            raise ValueError(f"unknown schedule mode {mode!r}")
        self._sub_mode = mode
        self._sub_stream = None

    # ------------------------------------------------------------ schedules
    def _build_subtree_schedules(self, parent: np.ndarray):
        n, ns, D = self.n, self.ns, self.n_shards
        struct, off_id = self.struct, self.off_id

        # components of the forest [0, ns): parent chains stay inside a
        # component until they hit the tail (parents always sit at higher
        # positions, so one descending pass resolves membership)
        comp = np.full(ns, -1, np.int64)
        n_comp = 0
        for j in range(ns - 1, -1, -1):
            p = parent[j]
            if p < 0 or p >= ns:
                comp[j] = n_comp
                n_comp += 1
            else:
                comp[j] = comp[p]

        # LPT assignment of whole components by estimated update work
        col_work = np.asarray(
            [(len(struct[j]) + 1) ** 2 for j in range(ns)], np.float64)
        comp_work = np.zeros(max(n_comp, 1))
        np.add.at(comp_work, comp, col_work)
        dev_of_comp = np.zeros(max(n_comp, 1), np.int64)
        load = np.zeros(D)
        for c in np.argsort(-comp_work):
            d = int(np.argmin(load))
            dev_of_comp[c] = d
            load[d] += comp_work[c]
        owner = dev_of_comp[comp] if ns else np.zeros(0, np.int64)
        self.subtree_owner = owner
        self.subtree_load = load

        # per-column LOCAL level (depth within its component — devices run
        # their own compacted schedules, so per-chip depth = deepest local
        # subtree, not the global etree depth)
        lvl = np.zeros(ns, np.int64)
        for j in range(ns):
            p = parent[j]
            if 0 <= p < ns:
                lvl[p] = max(lvl[p], lvl[j] + 1)
        Lmax = int(lvl.max()) + 1 if ns else 0
        L = Lmax + 1  # trailing level hosts tail-destined work from the top

        upd = [[[] for _ in range(L)] for _ in range(D)]
        cols = [[[] for _ in range(L)] for _ in range(D)]
        offs = [[[] for _ in range(L)] for _ in range(D)]
        fwd = [[[] for _ in range(L)] for _ in range(D)]
        bwd = [[[] for _ in range(L)] for _ in range(D)]
        for k in range(ns):
            d, lk = int(owner[k]), int(lvl[k])
            sk = struct[k]
            # left-looking updates sourced at k: dst column j is either in
            # k's component (same device, scheduled at j's local level > lk)
            # or a tail block (additive Schur contribution; any level > lk)
            for a, j in enumerate(sk):
                lj = int(lvl[j]) if j < ns else lk + 1
                upd[d][lj].append((j, off_id[(j, k)], off_id[(j, k)]))
                for i in sk[a + 1:]:
                    upd[d][lj].append(
                        (off_id[(i, j)], off_id[(i, k)], off_id[(j, k)]))
                fwd[d][lj].append((j, off_id[(j, k)], k))
            cols[d][lk].append(k)
            for i in sk:
                offs[d][lk].append((off_id[(i, k)], k))
            for i in sk:
                bwd[d][lk].append((k, off_id[(i, k)], i))

        # sort every device-level list by destination: duplicate-dst rows
        # become contiguous so the scatters can collapse them with a sorted
        # segment-sum before the .at[].add (TPU scatter serializes on
        # colliding indices; many subtree columns hit the same few tail
        # separator blocks at the same level)
        for phase in (upd, fwd, bwd):
            for dd in range(D):
                for ll in range(L):
                    phase[dd][ll].sort(key=lambda r: r[0])

        Z, T, TY = self.n_blocks, self.n_blocks + 1, self.n
        self._sub_raw = {"upd": upd, "cols": cols, "offs": offs,
                         "fwd": fwd, "bwd": bwd}

        def stack(phase, pads):
            """phase[d][l] = list of tuples -> per-level (f0[D,m], f1[D,m],
            ...) jnp arrays padded with `pads`, or None for empty levels."""
            out = []
            for l in range(L):
                m = max(len(phase[d][l]) for d in range(D))
                if m == 0:
                    out.append(None)
                    continue
                fields = []
                for fi, pad in enumerate(pads):
                    arr = np.full((D, m), pad, np.int32)
                    for d in range(D):
                        rows = phase[d][l]
                        if rows:
                            arr[d, :len(rows)] = [r[fi] for r in rows]
                    fields.append(jnp.asarray(arr))
                out.append(tuple(fields))
            return out

        self.sub_upd = stack(upd, (Z, Z, Z))
        # column phase: one id list indexes blocks (pad T: chol(I)=I) and,
        # during solves, a parallel list indexes the rhs rows (pad TY: row
        # stays zero) — same positions, different pad targets
        cols2 = [[[(j, j) for j in cols[d][l]] for l in range(L)]
                 for d in range(D)]
        self.sub_cols = stack(cols2, (T, TY))
        self.sub_offs = stack(offs, (T, T))
        self.sub_fwd = stack(fwd, (TY, Z, TY))
        self.sub_bwd = stack(bwd, (TY, Z, TY))
        self.n_sub_levels = L

    # -------------------------------------------------------------- numeric
    def _extend(self, blocks):
        b = self.b
        dtype = blocks.dtype
        return jnp.concatenate(
            [blocks, jnp.zeros((1, b, b), dtype),
             jnp.eye(b, dtype=dtype)[None]], 0)

    def factorize_subtree(self, blocks, axis_name):
        """Local subtree eliminations -> ONE delta psum (the parent frontal
        reduction) -> replicated dense-tail Cholesky. Returns (L_blocks,
        L_tail) exactly like the single-device dense-tail factorize."""
        if self._sub_mode == "stream":
            return self._factorize_subtree_stream(blocks, axis_name)
        idx = jax.lax.axis_index(axis_name)
        ext0 = self._extend(blocks)
        ext = ext0
        for upd, colp, offp in zip(self.sub_upd, self.sub_cols,
                                   self.sub_offs):
            if upd is not None:
                dst, s1, s2 = (a[idx] for a in upd)
                u = sb.matmul_hp(ext[s1], jnp.swapaxes(ext[s2], -1, -2))
                u2, dst2 = _collapse_sorted(u, dst)
                ext = ext.at[dst2].add(-u2, indices_are_sorted=True)
            if colp is not None:
                cb = colp[0][idx]
                ext = ext.at[cb].set(sb.cholesky(ext[cb]))
            if offp is not None:
                o, od = (a[idx] for a in offp)
                X = jnp.swapaxes(
                    sb.solve_lower(ext[od], jnp.swapaxes(ext[o], -1, -2)),
                    -1, -2)
                ext = ext.at[o].set(X)
        # frontal reduction: owned columns are disjoint across devices, tail
        # Schur contributions additive -> one psum of the delta reconstructs
        # the full factor on every device
        Lb = (ext0 + jax.lax.psum(ext - ext0, axis_name))[:self.n_blocks]
        return Lb, self._tail_dense_factor(Lb)

    def solve_subtree(self, L, rhs, axis_name):
        """Forward local sweep -> delta psum -> replicated dense tail solve
        -> backward local sweep -> delta psum. rhs (n, b) -> x (n, b)."""
        if self._sub_mode == "stream":
            return self._solve_subtree_stream(L, rhs, axis_name)
        idx = jax.lax.axis_index(axis_name)
        Lb, L_tail = L
        ext = self._extend(Lb)
        y0 = jnp.concatenate(
            [rhs, jnp.zeros((1, self.b), rhs.dtype)], 0)  # TY trash row
        y = y0
        for fwdp, colp in zip(self.sub_fwd, self.sub_cols):
            if fwdp is not None:
                dst, sblk, scol = (a[idx] for a in fwdp)
                c = jnp.einsum("mij,mj->mi", ext[sblk], y[scol],
                               precision="highest")
                c2, dst2 = _collapse_sorted(c, dst)
                y = y.at[dst2].add(-c2, indices_are_sorted=True)
            if colp is not None:
                cb, cy = colp[0][idx], colp[1][idx]
                y = y.at[cy].set(
                    sb.solve_lower(ext[cb], y[cy][..., None])[..., 0])
        y = y0 + jax.lax.psum(y - y0, axis_name)
        x0 = self._tail_solve(y, L_tail)  # replicated: rows [ns, ns+nt)
        x = x0
        for li in reversed(range(self.n_sub_levels)):
            bwdp, colp = self.sub_bwd[li], self.sub_cols[li]
            if bwdp is not None:
                dst, sblk, scol = (a[idx] for a in bwdp)
                c = jnp.einsum("mji,mj->mi", ext[sblk], x[scol],
                               precision="highest")
                c2, dst2 = _collapse_sorted(c, dst)
                x = x.at[dst2].add(-c2, indices_are_sorted=True)
            if colp is not None:
                cb, cy = colp[0][idx], colp[1][idx]
                x = x.at[cy].set(
                    sb.solve_upper_from_lower(
                        ext[cb], x[cy][..., None])[..., 0])
        x = x0 + jax.lax.psum(x - x0, axis_name)
        return x[:-1]

    # ------------------------------------------------- streamed numeric path
    def _pack_dev(self, phase, pad_row):
        """phase[d][l] lists of k-tuples -> per-level (m_l, D*k) row arrays
        (m_l = max over devices, device-tiled fields, trash-padded) ready
        for the chunk packer; chunk tails get the D-tiled pad row."""
        D = self.n_shards
        L = self.n_sub_levels
        k = len(pad_row)
        pad = np.asarray(pad_row, np.int64)
        per_level = []
        for ll in range(L):
            m = max(len(phase[d][ll]) for d in range(D))
            if m == 0:
                per_level.append(np.zeros((0, D * k), np.int64))
                continue
            arr = np.tile(pad[None, None], (m, D, 1))
            for d in range(D):
                rows = phase[d][ll]
                if rows:
                    arr[: len(rows), d, :] = np.asarray(rows, np.int64)
            per_level.append(arr.reshape(m, D * k))
        return per_level

    def _get_sub_stream(self):
        """Chunked device-side instruction streams over the subtree levels;
        schedule arrays carry a leading device axis (selected by axis_index
        in the kernels). Built once, lazily."""
        if self._sub_stream is not None:
            return self._sub_stream
        from ..ops.supernodal import _build_branched

        Z, T, TY = self.n_blocks, self.n_blocks + 1, self.n
        D = self.n_shards
        L = self.n_sub_levels
        raw = self._sub_raw
        cols2 = [[[(j, j) for j in raw["cols"][d][ll]] for ll in range(L)]
                 for d in range(D)]

        fact_br, (u_lv, c_lv, t_lv) = _build_branched([
            ("upd", self._pack_dev(raw["upd"], (Z, Z, Z)), (Z, Z, Z) * D),
            ("chol", self._pack_dev(cols2, (T, TY)), (T, TY) * D),
            ("trsm", self._pack_dev(raw["offs"], (T, T)), (T, T) * D),
        ])
        fwd_br, (fg_lv, fdg_lv) = _build_branched([
            ("gemv", self._pack_dev(raw["fwd"], (TY, Z, TY)), (TY, Z, TY) * D),
            ("diag", self._pack_dev(cols2, (T, TY)), (T, TY) * D),
        ])
        bwd_br, (bg_lv, bdg_lv) = _build_branched([
            ("gemv", self._pack_dev(raw["bwd"], (TY, Z, TY)), (TY, Z, TY) * D),
            ("diag", self._pack_dev(cols2, (T, TY)), (T, TY) * D),
        ])

        def seq(level_order, phase_lists):
            ops, args = [], []
            for li in level_order:
                for phases in phase_lists:
                    for op, ci in phases[li]:
                        ops.append(op)
                        args.append(ci)
            return ops, args

        self._sub_stream = (
            _Stream(*seq(range(L), [u_lv, c_lv, t_lv]), fact_br),
            _Stream(*seq(range(L), [fg_lv, fdg_lv]), fwd_br),
            _Stream(*seq(reversed(range(L)), [bg_lv, bdg_lv]), bwd_br),
        )
        return self._sub_stream

    def _run_stream(self, stream, mk, carry, idx):
        if stream.n_steps == 0:
            return carry
        branches = []
        for kind, arr in stream.branches:
            a = jnp.asarray(arr)  # (S, D*k, C)
            k = a.shape[1] // self.n_shards
            branches.append(
                mk[kind](a.reshape(a.shape[0], self.n_shards, k, a.shape[2]),
                         idx)
            )
        opcodes = jnp.asarray(stream.opcodes)
        arg_idx = jnp.asarray(stream.arg_idx)

        def body(i, c):
            return jax.lax.switch(opcodes[i], branches, c, arg_idx[i])

        return jax.lax.fori_loop(0, stream.n_steps, body, carry)

    def _factorize_subtree_stream(self, blocks, axis_name):
        fact, _, _ = self._get_sub_stream()
        idx = jax.lax.axis_index(axis_name)
        ext0 = self._extend(blocks)

        def upd(arr, idx):
            def f(ext, ai):
                dst, s1, s2 = arr[ai][idx]
                u = sb.matmul_hp(ext[s1], jnp.swapaxes(ext[s2], -1, -2))
                u2, dst2 = _collapse_sorted(u, dst)
                return ext.at[dst2].add(-u2, indices_are_sorted=True)
            return f

        def chol(arr, idx):
            def f(ext, ai):
                cb = arr[ai][idx][0]
                return ext.at[cb].set(sb.cholesky(ext[cb]),
                                      indices_are_sorted=True)
            return f

        def trsm(arr, idx):
            def f(ext, ai):
                o, od = arr[ai][idx]
                X = jnp.swapaxes(
                    sb.solve_lower(ext[od], jnp.swapaxes(ext[o], -1, -2)),
                    -1, -2)
                return ext.at[o].set(X)
            return f

        ext = self._run_stream(fact, {"upd": upd, "chol": chol, "trsm": trsm},
                               ext0, idx)
        Lb = (ext0 + jax.lax.psum(ext - ext0, axis_name))[:self.n_blocks]
        return Lb, self._tail_dense_factor(Lb)

    def _solve_subtree_stream(self, L, rhs, axis_name):
        _, fwd, bwd = self._get_sub_stream()
        idx = jax.lax.axis_index(axis_name)
        Lb, L_tail = L
        ext = self._extend(Lb)

        def gemv(spec):
            def mk(arr, idx):
                def f(y, ai):
                    dst, sblk, scol = arr[ai][idx]
                    c = jnp.einsum(spec, ext[sblk], y[scol],
                                   precision="highest")
                    c2, dst2 = _collapse_sorted(c, dst)
                    return y.at[dst2].add(-c2, indices_are_sorted=True)
                return f
            return mk

        def diag(solve):
            def mk(arr, idx):
                def f(y, ai):
                    cb, cy = arr[ai][idx]
                    return y.at[cy].set(
                        solve(ext[cb], y[cy][..., None])[..., 0],
                        indices_are_sorted=True)
                return f
            return mk

        y0 = jnp.concatenate(
            [rhs, jnp.zeros((1, self.b), rhs.dtype)], 0)  # TY trash row
        y = self._run_stream(
            fwd, {"gemv": gemv("mij,mj->mi"), "diag": diag(sb.solve_lower)},
            y0, idx)
        y = y0 + jax.lax.psum(y - y0, axis_name)
        x0 = self._tail_solve(y, L_tail)  # replicated: rows [ns, ns+nt)
        x = self._run_stream(
            bwd, {"gemv": gemv("mji,mj->mi"),
                  "diag": diag(sb.solve_upper_from_lower)},
            x0, idx)
        x = x0 + jax.lax.psum(x - x0, axis_name)
        return x[:-1]


def lm_solve_subtree_sharded(
    graph,
    values0,
    mesh: Optional[Mesh] = None,
    config: LMConfig = LMConfig(),
    axis_name: str = "node",
    tail_cap: int = 256,
    mode: str = "auto",
):
    """Full LM with subtree-pipelined factorization (P3) + factor-sharded
    assembly over the mesh. Returns (values, SolveStats)."""
    from ..solve.lm import _lm_loop

    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    gp = pad_graph(graph, n_dev)
    sn = SubtreeShardedSolver(gp, values0, n_dev, tail_cap=tail_cap,
                              mode=mode)
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype

    graph_specs = jax.tree_util.tree_map(lambda _: P(axis_name), gp)
    values_specs = jax.tree_util.tree_map(lambda _: P(), values0)
    gp = global_put(gp, mesh, graph_specs)
    values0 = global_put(values0, mesh, values_specs)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(graph_specs, values_specs),
        out_specs=jax.tree_util.tree_map(
            lambda _: P(), (values0, _stats_struct(config, dtype))
        ),
        check_vma=False,
    )
    def run(graph_local, values_rep):
        def error_fn(values):
            return jax.lax.psum(graphlib.error(graph_local, values),
                                axis_name)

        def step_fn(values, lam):
            lins = graphlib.linearize(graph_local, values)
            blocks, g = sn.assemble_local(graph_local, lins, values,
                                          axis_name)
            blocks, g = jax.lax.psum((blocks, g), axis_name)
            blocks = sn.add_damping(blocks, lam)
            L = sn.factorize_subtree(blocks, axis_name)
            x = sn.solve_subtree(L, -g, axis_name)
            return sn.unpack(gp, x)

        def retract_fn(values, delta):
            return graphlib.retract_all(graph_local, values, delta)

        return _lm_loop(values_rep, error_fn, step_fn, retract_fn, config,
                        dtype)

    return jax.jit(run)(gp, values0)
