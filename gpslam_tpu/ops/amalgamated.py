"""Amalgamated supernodal Cholesky — the junction-tree capability of the
reference (SURVEY.md §2.2 S8 "clique amalgamation -> JunctionTree
(supernodes)") rebuilt for level-batched TPU execution.

The plain SupernodalSolver treats every variable as its own column, so its
level schedule depth equals the elimination-tree depth — on loop-closure
pose graphs the etree contains long chains, and a 600-state graph already
runs 101 sequential levels (latency-bound, 0.5 GFLOP/s measured). This
solver AMALGAMATES maximal etree chains (positions j with parent[j]=j+1,
capped at `w_max`) into supernodes of panel width w*b:

  - the variable-level Hessian blocks are assembled exactly as before,
    then scatter-copied into (B, B) supernode panels (B = w_max*b, padded
    with identity on unused dims so every diagonal panel stays SPD);
  - the SAME level-batched factorization/solve machinery then runs on the
    supernode tree: ~w_max-fold fewer levels, and every batched op works
    on w_max^2-fold bigger (MXU-friendlier) panels.

Correctness is partition-independent: block Cholesky is valid under ANY
consecutive grouping; the supernode fill pattern is computed by symbolic
factorization on the supernode quotient graph (a superset of the mapped
variable-level fill). Amalgamating etree chains just minimizes the stored
zeros.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from . import order as order_mod
from .supernodal import SupernodalSolver


class AmalgamatedSupernodalSolver(SupernodalSolver):
    """Supernodal solver over amalgamated etree-chain panels.

    Inherits the numeric level-batched factorize/solve_factored/add_damping
    from SupernodalSolver (they only consult the schedules built here);
    assembly goes variable-blocks -> supernode panels.
    """

    def __init__(self, graph: Graph, values, w_max: int = 4,
                 ordering: str = "md", mode: str = "auto",
                 dense_tail: int = 0):
        # ---- variable-level setup (mirrors SupernodalSolver) -----------
        self.groups = list(values.keys())
        dims = {g: graph.manifolds[g].dim for g in self.groups}
        b = max(dims.values())
        self.b_var = b
        self.group_sizes = {
            g: jax.tree_util.tree_leaves(values[g])[0].shape[0]
            for g in self.groups
        }
        self.group_offset = {}
        off = 0
        for g in self.groups:
            self.group_offset[g] = off
            off += self.group_sizes[g]
        n_var = off
        self.n_var = n_var
        var_dim = np.zeros(n_var, np.int64)
        for g in self.groups:
            var_dim[self.group_offset[g] : self.group_offset[g]
                    + self.group_sizes[g]] = dims[g]

        indptr, indices, _ = order_mod.adjacency_from_graph(graph, values)
        from .supernodal import _run_ordering

        perm = _run_ordering(indptr, indices, ordering)
        _, parent_var, _ = order_mod.symbolic_factor(indptr, indices, perm)
        self.perm = perm
        pos = np.zeros(n_var, np.int64)
        pos[perm] = np.arange(n_var)
        self.pos = pos

        # ---- supernodes: maximal etree chains, width <= w_max ----------
        snode = np.zeros(n_var, np.int64)   # by elimination position
        off_in = np.zeros(n_var, np.int64)  # slot within the supernode
        widths = []
        s = -1
        w = 0
        for j in range(n_var):
            if s < 0 or w >= w_max or not (
                j > 0 and parent_var[j - 1] == j and snode[j - 1] == s
            ):
                s += 1
                w = 0
                widths.append(0)
            snode[j] = s
            off_in[j] = w
            w += 1
            widths[s] = w
        n_s = s + 1
        self.snode = snode
        self.off_in = off_in
        self.widths = np.asarray(widths, np.int64)
        self.w_max = w_max

        # ---- supernode quotient graph + symbolic factorization ---------
        pairs = set()
        for u in range(n_var):
            pu = pos[u]
            for p in range(indptr[u], indptr[u + 1]):
                pv = pos[indices[p]]
                su, sv = int(snode[pu]), int(snode[pv])
                if su != sv:
                    pairs.add((min(su, sv), max(su, sv)))
        adj = [[] for _ in range(n_s)]
        for a, c in pairs:
            adj[a].append(c)
            adj[c].append(a)
        mptr = np.zeros(n_s + 1, np.int64)
        for i in range(n_s):
            mptr[i + 1] = mptr[i] + len(adj[i])
        midx = np.zeros(mptr[-1], np.int64)
        for i in range(n_s):
            midx[mptr[i] : mptr[i + 1]] = sorted(adj[i])
        meta_struct, meta_parent, _ = order_mod.symbolic_factor(
            mptr, midx, np.arange(n_s, dtype=np.int64)
        )

        # ---- numeric schedules at panel size B over the supernode tree -
        self.n = n_s
        self.b = w_max * b
        # dense tail over trailing SUPERNODES (panels) — same switch-to-
        # dense trick as the base class, at panel granularity
        self.n_tail = min(max(int(dense_tail), 0), n_s)
        self._build_numeric_schedules(meta_struct, meta_parent)
        self._set_mode(mode)

        # identity padding: slot q of supernode s is active on
        # [q*b, q*b + var_dim) for q < width(s); everything else padded
        pad_eye = np.zeros((n_s, self.b, self.b))
        active = np.zeros((n_s, self.b), bool)
        for j in range(n_var):
            v = perm[j]
            o = int(off_in[j]) * b
            active[int(snode[j]), o : o + int(var_dim[v])] = True
        for si in range(n_s):
            for d in range(self.b):
                if not active[si, d]:
                    pad_eye[si, d, d] = 1.0
        self._pad_eye = pad_eye

        # ---- variable-block storage touched by factors ------------------
        # diag blocks by position [0..n_var), plus factor-adjacent
        # off-position blocks (pi, pj), pi > pj
        vb_id: Dict[Tuple[int, int], int] = {}
        nid = n_var
        self._var_assembly = []
        for batch in graph.batches:
            idx = [
                np.asarray(ix) + self.group_offset[batch.groups[si]]
                for si, ix in enumerate(batch.idx)
            ]
            per_pair = []
            for sslot in range(len(batch.groups)):
                for tslot in range(len(batch.groups)):
                    ps = pos[idx[sslot]]
                    pt = pos[idx[tslot]]
                    if sslot == tslot:
                        dst = ps.astype(np.int32)
                        transpose = np.zeros(len(ps), bool)
                    elif sslot < tslot:
                        dst = np.zeros(len(ps), np.int32)
                        transpose = ps < pt
                        for m in range(len(ps)):
                            i, j = ((int(pt[m]), int(ps[m]))
                                    if ps[m] < pt[m]
                                    else (int(ps[m]), int(pt[m])))
                            if (i, j) not in vb_id:
                                vb_id[(i, j)] = nid
                                nid += 1
                            dst[m] = vb_id[(i, j)]
                    else:
                        continue
                    per_pair.append((sslot, tslot, jnp.asarray(dst),
                                     jnp.asarray(transpose)))
            self._var_assembly.append(per_pair)
        self.n_var_blocks = nid

        # ---- var-block -> supernode-panel copy schedule -----------------
        dstm = np.zeros(nid, np.int32)
        oi = np.zeros(nid, np.int32)
        oj = np.zeros(nid, np.int32)
        meta_off = self.off_id  # built by _build_numeric_schedules
        for pi in range(n_var):
            dstm[pi] = int(snode[pi])  # diag panels have ids [0, n_s)
            oi[pi] = oj[pi] = int(off_in[pi]) * b
        for (pi, pj), vid in vb_id.items():
            si, sj = int(snode[pi]), int(snode[pj])
            dstm[vid] = si if si == sj else meta_off[(si, sj)]
            oi[vid] = int(off_in[pi]) * b
            oj[vid] = int(off_in[pj]) * b
        self._copy_dst = jnp.asarray(dstm)
        self._copy_oi = jnp.asarray(oi)
        self._copy_oj = jnp.asarray(oj)

        # gradient scatter: position p -> (panel row snode[p], col offset)
        self._g_row = jnp.asarray(snode)
        self._g_col = jnp.asarray(off_in * b)

    # ------------------------------------------------------------ numeric
    def assemble_raw(self, graph, lins, values, assembly=None):
        """Variable-block assembly + scatter-copy into supernode panels.

        `assembly` overrides the variable-block destination tables (the
        sharded P2/P3 solvers pass per-device slices of the same tables;
        the panel copy is linear, so per-device partial panels psum to the
        full assembly)."""
        if assembly is None:
            assembly = self._var_assembly
        dtype = jax.tree_util.tree_leaves(values)[0].dtype
        b = self.b_var
        vb = jnp.zeros((self.n_var_blocks, b, b), dtype)
        g_var = jnp.zeros((self.n_var, b), dtype)
        pos = jnp.asarray(self.pos)

        def pad_last(J):
            d = J.shape[-1]
            return J if d == b else jnp.pad(J, ((0, 0), (0, 0), (0, b - d)))

        for batch, lin, pairs in zip(graph.batches, lins, assembly):
            for sslot in range(len(batch.groups)):
                Js = pad_last(lin.J[sslot])
                contrib = jnp.einsum("mri,mr->mi", Js, lin.r)
                ps = pos[batch.idx[sslot]
                         + self.group_offset[batch.groups[sslot]]]
                g_var = g_var.at[ps].add(contrib)
            for sslot, tslot, dst, transpose in pairs:
                blk = jnp.einsum("mri,mrj->mij", pad_last(lin.J[sslot]),
                                 pad_last(lin.J[tslot]))
                blk = jnp.where(transpose[:, None, None],
                                jnp.swapaxes(blk, -1, -2), blk)
                vb = vb.at[dst].add(blk)

        # copy variable blocks into panels at their static offsets
        ar = jnp.arange(b)
        rows = (self._copy_oi[:, None] + ar)[:, :, None]
        cols = (self._copy_oj[:, None] + ar)[:, None, :]
        panels = jnp.zeros((self.n_blocks, self.b, self.b), dtype)
        panels = panels.at[self._copy_dst[:, None, None], rows, cols].add(vb)
        # intra-panel couplings land lower-triangle-only; the B > 16
        # Cholesky path (jnp.linalg) symmetrizes its input, so mirror the
        # diagonal panels explicitly
        diag = panels[: self.n]
        diag = jnp.tril(diag) + jnp.swapaxes(jnp.tril(diag, -1), -1, -2)
        panels = panels.at[: self.n].set(diag)

        g = jnp.zeros((self.n, self.b), dtype)
        gc = (self._g_col[:, None] + ar)
        g = g.at[self._g_row[:, None], gc].add(g_var)
        return panels, g

    def diag_marginals(self, S, graph):
        """Per-variable marginals out of supernode-panel diagonals: variable
        at position p lives in panel snode[p] at offset off_in[p]*b_var."""
        b = self.b_var
        ar = jnp.arange(b)
        rows = self._g_row[:, None, None]
        ri = (self._g_col[:, None] + ar)[:, :, None]
        ci = (self._g_col[:, None] + ar)[:, None, :]
        Sv = S[rows, ri, ci]          # (n_var, b, b) by elimination position
        Sv = Sv[jnp.asarray(self.pos)]  # by global variable id
        out = {}
        for grp in self.groups:
            o = self.group_offset[grp]
            nn = self.group_sizes[grp]
            d = graph.manifolds[grp].dim
            out[grp] = Sv[o : o + nn, :d, :d]
        return out

    def joint_marginal_pairs(self, S, graph, pairs):
        """Pairwise joint tangent covariances out of supernode PANELS.

        Overrides the per-variable base implementation (whose block ids and
        `pos` indexing do not apply to panel storage — using it here would
        silently return wrong covariances). Variable at elimination position
        p lives in panel snode[p] at row/col offset off_in[p]*b_var; pairs
        within one supernode read the diagonal panel, pairs across
        supernodes read the meta off-diagonal panel. Same-variable pairs
        degrade to the duplicated marginal; pairs outside the supernode fill
        pattern raise (dense fallback applies).
        """
        b = self.b_var
        out = []
        for (ga, ia), (gb, ib) in pairs:
            da = graph.manifolds[ga].dim
            db = graph.manifolds[gb].dim
            pa = int(self.pos[self.group_offset[ga] + int(ia)])
            pb = int(self.pos[self.group_offset[gb] + int(ib)])
            sa, sb_ = int(self.snode[pa]), int(self.snode[pb])
            oa, ob = int(self.off_in[pa]) * b, int(self.off_in[pb]) * b
            Saa = S[sa, oa : oa + da, oa : oa + da]
            Sbb = S[sb_, ob : ob + db, ob : ob + db]
            if pa == pb:
                top = jnp.concatenate([Saa, Saa], axis=-1)
                out.append(jnp.concatenate([top, top], axis=-2))
                continue
            if sa == sb_:
                Sab = S[sa, oa : oa + da, ob : ob + db]
            else:
                key = (max(sa, sb_), min(sa, sb_))
                if key not in self.off_id:
                    raise ValueError(
                        f"pair {((ga, int(ia)), (gb, int(ib)))} is outside "
                        f"the supernode fill pattern; use the dense fallback"
                    )
                panel = S[self.off_id[key]]  # rows: max snode, cols: min
                if sa > sb_:
                    Sab = panel[oa : oa + da, ob : ob + db]
                else:
                    Sab = jnp.swapaxes(
                        panel[ob : ob + db, oa : oa + da], -1, -2
                    )
            top = jnp.concatenate([Saa, Sab], axis=-1)
            bot = jnp.concatenate([jnp.swapaxes(Sab, -1, -2), Sbb], axis=-1)
            out.append(jnp.concatenate([top, bot], axis=-2))
        return out

    @property
    def solver(self):
        """lm_solve-compatible: solver(graph, values, lins, lam) -> delta."""
        b = self.b_var
        pos = jnp.asarray(self.pos)
        ar = jnp.arange(b)

        def _solve(graph, values, lins, lam):
            panels, g = self.assemble_raw(graph, lins, values)
            panels = self.add_damping(panels, lam)
            L = self.factorize(panels)
            x = self.solve_factored(L, -g)  # (n_s, B)
            # unpack: variable v at position p lives in panel snode[p]
            xv = x[self._g_row[:, None], self._g_col[:, None] + ar]
            x_var = xv[pos]  # (n_var, b) by global variable id
            out = {}
            for grp in self.groups:
                o = self.group_offset[grp]
                nn = self.group_sizes[grp]
                d = graph.manifolds[grp].dim
                out[grp] = x_var[o : o + nn, :d]
            return out

        return _solve
