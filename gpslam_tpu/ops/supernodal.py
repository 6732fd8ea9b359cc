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


class SupernodalSolver:
    """Build once per graph structure; `solver` property plugs into lm_solve."""

    def __init__(self, graph: Graph, values):
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

        indptr, indices, _ = order_mod.adjacency_from_graph(graph, values)
        perm = order_mod.min_degree_ordering(indptr, indices)
        struct, parent, _fill = order_mod.symbolic_factor(indptr, indices, perm)
        self.perm = perm  # perm[pos] = variable
        pos = np.zeros(n, np.int64)
        pos[perm] = np.arange(n)
        self.pos = pos
        self._build_numeric_schedules(struct, parent)
        self._build_assembly(graph)
        self._build_pad_eye(var_dim)

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
        self.levels = levels

        # ---- schedules -------------------------------------------------
        # update triples per level of the destination column j:
        #   dst block (i, j) [diag if i == j]  -=  L[i,k] @ L[j,k]^T
        upd: List[List[Tuple[int, int, int]]] = [[] for _ in levels]
        level_of = np.zeros(n, np.int64)
        for li, lv in enumerate(levels):
            for j in lv:
                level_of[j] = li
        for k in range(n):
            sk = struct[k]
            for a, j in enumerate(sk):
                lj = int(level_of[j])
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
        # off blocks of the column + their diag id
        self.col_sched = []
        for lv in levels:
            cols = np.asarray(lv, np.int32)
            offs = []
            offs_diag = []
            for j in lv:
                for i in struct[j]:
                    offs.append(off_id[(i, j)])
                    offs_diag.append(j)
            self.col_sched.append(
                (cols, np.asarray(offs, np.int32), np.asarray(offs_diag, np.int32))
            )
        # forward solve: y[j] -= L[j,k] y[k] for j in struct[k] (dst level of j)
        fwd: List[List[Tuple[int, int, int]]] = [[] for _ in levels]
        for k in range(n):
            for j in struct[k]:
                fwd[int(level_of[j])].append((j, off_id[(j, k)], k))
        self.fwd_sched = [
            (
                np.asarray([t[0] for t in f], np.int32),
                np.asarray([t[1] for t in f], np.int32),
                np.asarray([t[2] for t in f], np.int32),
            )
            for f in fwd
        ]
        # backward solve: x[j] -= L[i,j]^T x[i] for i in struct[j]
        bwd: List[List[Tuple[int, int, int]]] = [[] for _ in levels]
        for j in range(n):
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

    def factorize(self, blocks):
        """In-place left-looking level-batched factorization: A -> L."""
        for (u_dst, u_s1, u_s2), (cols, offs, offs_diag) in zip(
            self.upd_sched, self.col_sched
        ):
            if len(u_dst):
                upd = sb.matmul_hp(
                    blocks[u_s1], jnp.swapaxes(blocks[u_s2], -1, -2)
                )
                blocks = blocks.at[u_dst].add(-upd)
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

    def solve_factored(self, blocks, rhs):
        """rhs (n, b) in elimination positions -> x (n, b)."""
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
            y = y.at[cols].set(
                sb.solve_lower(blocks[cols], y[cols][..., None])[..., 0]
            )
        x = y
        for li in reversed(range(len(self.levels))):
            dst, src_blk, src_col = self.bwd_sched[li]
            cols = self.col_sched[li][0]
            if len(dst):
                contrib = jnp.einsum(
                    "mji,mj->mi", blocks[src_blk], x[src_col],
                    precision="highest",
                )
                x = x.at[dst].add(-contrib)
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
            for jj, j in enumerate(lv):
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
        S = jnp.zeros_like(L)
        eye = jnp.eye(self.b, dtype=L.dtype)
        for li in reversed(range(len(self.levels))):
            cols, offs, offs_diag = self.col_sched[li]
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
