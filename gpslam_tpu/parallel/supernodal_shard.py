"""Supernode-sharded sparse Cholesky over the device mesh (SURVEY.md §2.4 P2,
BASELINE "sharding ... elimination-tree supernodes ... frontal-matrix
reduction").

The reference eliminates its junction tree sequentially in one thread
(SURVEY.md §3.1 hot loop #2). The single-device TPU replacement
(ops/supernodal.SupernodalSolver) already batches each elimination-tree LEVEL
into dense block ops; this module distributes those levels over a mesh axis
`'node'`:

  - the per-level UPDATE work  L[i,j] -= L[i,k] @ L[j,k]^T  — the O(fill^2)
    matmul-heavy part, the analog of the reference's frontal-matrix Schur
    updates — is sharded over devices: each device computes a slice of the
    level's update triples and scatters into a COMPACT per-level destination
    buffer; ONE psum per level reduces the partial frontal contributions
    (this psum is exactly the "frontal-matrix reduction" collective);
  - the column factorizations (tiny batched Cholesky/TRSM — latency-bound,
    not FLOP-bound) run replicated, so the factor stays consistent on all
    devices with zero extra communication;
  - factor linearization + J^T J assembly is sharded over the SAME mesh axis
    (P1 composition): each device linearizes its factor shard and one psum
    produces the replicated block storage.

The whole LM loop runs inside one shard_map region: per-iteration
communication = 1 psum of the assembled blocks + 1 psum per elimination
level + 1 scalar psum for the candidate error. Everything is a static-shape
tensor program; scales to multi-host by widening the mesh.

mode="stream" compiles O(1) in elimination levels (the r2 verdict's item 3:
large irregular graphs on many devices are exactly where the per-level
Python unroll hurts): the level loop becomes one `lax.fori_loop` over a
chunked opcode stream [UPD*, REDUCE, APPLY*, CHOL*, TRSM*] per level.
UPD chunks carry a leading device axis (each device computes its slice of
the level's sorted update triples and accumulates into a fixed-capacity
compact delta buffer); REDUCE is the per-level frontal psum of that buffer
(fixed shape, so one collective op serves every level); APPLY subtracts the
reduced delta into the replicated block storage and re-zeroes the rows.
The triangular solves reuse the base class's replicated streams.
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
from ..ops import smallblock as sb
from ..ops.amalgamated import AmalgamatedSupernodalSolver
from ..ops.supernodal import SupernodalSolver, _Stream, _collapse_sorted
from .mesh import make_mesh
from .solve import _stats_struct, pad_graph


class ShardedSupernodalSolver(SupernodalSolver):
    """SupernodalSolver + per-level sharded schedules for n_shards devices.

    Build on the PADDED graph (factor counts divisible by n_shards); the
    sharded methods are meant to be called inside a shard_map region over
    `axis_name` with the graph's factor tables sharded along that axis.
    """

    def __init__(self, graph, values, n_shards: int,
                 pallas_stream: Optional[bool] = None, **solver_kw):
        super().__init__(graph, values, **solver_kw)
        self.n_shards = n_shards
        self._sharded_stream = {}
        # pallas_stream: feed the streamed factorization's UPD/TRSM steps
        # through the gather-GEMM kernels (ops/pallas_supernodal.py) instead
        # of XLA gather->matmul->scatter chains — the same ~0.4 ms-per-op
        # dispatch-latency kill as single-device mode="pallas", applied to
        # the device-indexed sharded schedules (VERDICT r3 item 6). The
        # index slices are RUNTIME values (axis_index-dependent); they ride
        # as scalar-prefetch operands. auto (None): TPU backend + f32-
        # compatible panels. The frontal psum/REDUCE structure is unchanged.
        if pallas_stream is None:
            pallas_stream = (jax.default_backend() == "tpu"
                             and self.b % 8 == 0)
        if pallas_stream and self.b % 8 != 0:
            raise ValueError(
                f"pallas_stream needs a block dim divisible by 8; got "
                f"b={self.b}"
            )
        self._pallas_stream = bool(pallas_stream)

        # ---- sharded update schedules: per level, split the triple list
        # over devices and remap destinations to a compact per-level range
        # (the psum payload = this level's touched frontal blocks only).
        self.upd_sched_sh = []
        for dst, s1, s2 in self.upd_sched:
            m = len(dst)
            if m == 0:
                self.upd_sched_sh.append(None)
                continue
            uniq, compact = np.unique(dst, return_inverse=True)
            n_dst = len(uniq)
            m_pad = ((m + n_shards - 1) // n_shards) * n_shards
            pad = m_pad - m
            # padded triples compute garbage from block 0 and scatter it to
            # the dropped row n_dst
            c = np.concatenate([compact, np.full(pad, n_dst)]).astype(np.int32)
            a1 = np.concatenate([s1, np.zeros(pad, np.int32)]).astype(np.int32)
            a2 = np.concatenate([s2, np.zeros(pad, np.int32)]).astype(np.int32)
            self.upd_sched_sh.append((
                uniq.astype(np.int32),
                c.reshape(n_shards, -1),
                a1.reshape(n_shards, -1),
                a2.reshape(n_shards, -1),
            ))

        # ---- sharded assembly destination tables: slice each batch's
        # per-factor dst/transpose arrays into per-device rows (factor
        # tables are sharded contiguously along the leading axis, matching
        # shard_map's placement). Source tables are the base solver's
        # per-variable-block `assembly` OR the amalgamated solver's
        # `_var_assembly` (4-tuples without the `keep` column) — arity is
        # preserved so `assemble_raw` sees the format it expects.
        src_assembly = getattr(self, "_var_assembly", None)
        if src_assembly is None:
            src_assembly = self.assembly
        self.assembly_sh = []
        for pairs in src_assembly:
            sh_pairs = []
            for entry in pairs:
                s, t, dst, transpose = entry[:4]
                rest = tuple(entry[4:])
                m = dst.shape[0]
                if m % n_shards != 0:
                    raise ValueError(
                        f"factor count {m} not divisible by {n_shards}; "
                        f"build the solver on pad_graph(graph, n_shards)"
                    )
                sh_pairs.append((
                    s, t,
                    jnp.asarray(np.asarray(dst).reshape(n_shards, -1)),
                    jnp.asarray(np.asarray(transpose).reshape(n_shards, -1)),
                    rest,
                ))
            self.assembly_sh.append(sh_pairs)

    # ------------------------------------------------------------ sharded
    def assemble_local(self, graph_local, lins_local, values, axis_name):
        """Local partial (blocks, g) from this device's factor shard;
        caller psums. Gradient gathers use the local idx arrays directly;
        Hessian destinations come from this device's slice of the tables."""
        idx = jax.lax.axis_index(axis_name)
        assembly = [
            [(s, t, dst2d[idx], tr2d[idx]) + rest
             for (s, t, dst2d, tr2d, rest) in pairs]
            for pairs in self.assembly_sh
        ]
        return self.assemble_raw(graph_local, lins_local, values,
                                 assembly=assembly)

    def factorize_sharded(self, blocks, axis_name):
        """Level-batched factorization with the update work sharded over
        `axis_name`; one compact psum per level (frontal reduction).
        mode="stream" runs the chunked opcode stream instead (compile O(1)
        in levels; same communication structure)."""
        if self._mode == "stream":
            return self._factorize_sharded_stream(blocks, axis_name)
        idx = jax.lax.axis_index(axis_name)
        dtype = blocks.dtype
        b = self.b
        for sh, (cols, offs, offs_diag) in zip(
            self.upd_sched_sh, self.col_sched
        ):
            if sh is not None:
                uniq, c2d, a1_2d, a2_2d = sh
                c = jnp.asarray(c2d)[idx]
                a1 = jnp.asarray(a1_2d)[idx]
                a2 = jnp.asarray(a2_2d)[idx]
                upd = sb.matmul_hp(
                    blocks[a1], jnp.swapaxes(blocks[a2], -1, -2)
                )
                delta = jnp.zeros((len(uniq) + 1, b, b), dtype)
                delta = delta.at[c].add(upd)
                delta = jax.lax.psum(delta, axis_name)
                blocks = blocks.at[jnp.asarray(uniq)].add(-delta[:-1])
            # replicated column factorization (identical on every device)
            Ld = sb.cholesky(blocks[cols])
            blocks = blocks.at[cols].set(Ld)
            if len(offs):
                B = blocks[offs]
                Ljj = blocks[offs_diag]
                X = jnp.swapaxes(
                    sb.solve_lower(Ljj, jnp.swapaxes(B, -1, -2)), -1, -2
                )
                blocks = blocks.at[offs].set(X)
        if self.n_tail:
            # dense top-of-tree, replicated (same as the streamed variants —
            # previously the unrolled sharded path dropped the tail factor
            # and solve_factored crashed unpacking it)
            return blocks, self._tail_dense_factor(blocks)
        return blocks

    # ------------------------------------------------- streamed factorization
    def _get_sharded_stream(self, pallas: bool = False):
        """Chunked opcode stream for the sharded factorization. Per level:
        [UPD* (device-indexed, into the compact delta), REDUCE (fixed-shape
        frontal psum), APPLY* (delta -> blocks, re-zero), CHOL*, TRSM*].

        pallas=True builds the gather-GEMM variant: identical structure, but
        TRSM pad rows point the second operand at the Linv trash row n
        (identity) instead of the ext trash block — the kernels contract
        against the panel-inverse table, not solve against ext."""
        if pallas in self._sharded_stream:
            return self._sharded_stream[pallas]
        from ..ops.supernodal import _build_branched

        D = self.n_shards
        Z, T = self.n_blocks, self.n_blocks + 1
        L = len(self.levels)

        # per level: sort triples by dst, compact ids, contiguous split
        level_uniq = []
        cap = 1
        for dst, s1, s2 in self.upd_sched:
            if len(dst) == 0:
                level_uniq.append(None)
                continue
            order = np.argsort(dst, kind="stable")
            uniq, compact = np.unique(dst[order], return_inverse=True)
            level_uniq.append((uniq, compact, s1[order], s2[order]))
            cap = max(cap, len(uniq))
        self._delta_cap = cap

        upd_rows, apply_rows = [], []
        for lu in level_uniq:
            if lu is None:
                upd_rows.append(np.zeros((0, D * 3), np.int64))
                apply_rows.append(np.zeros((0, 2), np.int64))
                continue
            uniq, compact, a1, a2 = lu
            m = len(compact)
            W = -(-m // D)
            rows = np.tile(np.asarray([cap, Z, Z], np.int64)[None, None],
                           (W, D, 1))
            tri = np.stack([compact, a1, a2], 1)
            for d in range(D):
                sl = tri[d * W:(d + 1) * W]
                rows[: len(sl), d, :] = sl
            upd_rows.append(rows.reshape(W, D * 3))
            apply_rows.append(
                np.stack([uniq, np.arange(len(uniq))], 1).astype(np.int64)
            )

        def sort0(rows_list):
            out = []
            for rows in rows_list:
                if len(rows):
                    rows = rows[np.argsort(rows[:, 0], kind="stable")]
                out.append(rows)
            return out

        chol_rows = [c[0].reshape(-1, 1) for c in self.col_sched]
        trsm_rows = sort0([
            np.stack([c[1], c[2]], 1) if len(c[1]) else np.zeros((0, 2))
            for c in self.col_sched
        ])

        fact_br, (u_lv, a_lv, c_lv, t_lv) = _build_branched([
            ("upd", upd_rows, (cap, Z, Z) * D),
            ("apply", apply_rows, (T, cap)),
            ("chol", chol_rows, (T,)),
            ("trsm", trsm_rows, (T, self.n if pallas else T)),
        ])
        reduce_op = len(fact_br)
        fact_br.append(("reduce", np.zeros((1, 1, 1), np.int32)))

        ops, args = [], []
        for li in range(L):
            for op, ci in u_lv[li]:
                ops.append(op)
                args.append(ci)
            if u_lv[li]:
                ops.append(reduce_op)
                args.append(0)
            for phases in (a_lv, c_lv, t_lv):
                for op, ci in phases[li]:
                    ops.append(op)
                    args.append(ci)
        self._sharded_stream[pallas] = _Stream(ops, args, fact_br)
        return self._sharded_stream[pallas]

    def _factorize_sharded_stream(self, blocks, axis_name):
        if self._pallas_stream and blocks.dtype == jnp.float32:
            return self._factorize_sharded_stream_pallas(blocks, axis_name)
        stream = self._get_sharded_stream()
        idx = jax.lax.axis_index(axis_name)
        D = self.n_shards
        b = self.b
        dtype = blocks.dtype
        cap = self._delta_cap
        pad = jnp.stack([jnp.zeros((b, b), dtype), jnp.eye(b, dtype=dtype)])
        ext = jnp.concatenate([blocks, pad], 0)
        delta = jnp.zeros((cap + 1, b, b), dtype)

        def upd(arr):
            a = jnp.asarray(arr)
            a = a.reshape(a.shape[0], D, 3, a.shape[2])

            def f(carry, ai):
                ext, delta = carry
                dstc, s1, s2 = a[ai][idx]
                u = sb.matmul_hp(ext[s1], jnp.swapaxes(ext[s2], -1, -2))
                u2, dst2 = _collapse_sorted(u, dstc)
                return (ext,
                        delta.at[dst2].add(u2, indices_are_sorted=True))
            return f

        def reduce_(arr):
            def f(carry, ai):
                ext, delta = carry
                return (ext, jax.lax.psum(delta, axis_name))
            return f

        def apply_(arr):
            a = jnp.asarray(arr)

            def f(carry, ai):
                ext, delta = carry
                bids, drows = a[ai]
                ext = ext.at[bids].add(-delta[drows],
                                       indices_are_sorted=True)
                delta = delta.at[drows].set(
                    jnp.zeros((), dtype), indices_are_sorted=True)
                return (ext, delta)
            return f

        def chol(arr):
            a = jnp.asarray(arr)

            def f(carry, ai):
                ext, delta = carry
                cols = a[ai][0]
                return (ext.at[cols].set(sb.cholesky(ext[cols]),
                                         indices_are_sorted=True), delta)
            return f

        def trsm(arr):
            a = jnp.asarray(arr)

            def f(carry, ai):
                ext, delta = carry
                offs, od = a[ai]
                X = jnp.swapaxes(
                    sb.solve_lower(ext[od], jnp.swapaxes(ext[offs], -1, -2)),
                    -1, -2)
                return (ext.at[offs].set(X), delta)
            return f

        mk = {"upd": upd, "reduce": reduce_, "apply": apply_, "chol": chol,
              "trsm": trsm}
        branches = [mk[kind](arr) for kind, arr in stream.branches]
        opcodes = jnp.asarray(stream.opcodes)
        arg_idx = jnp.asarray(stream.arg_idx)

        def body(i, carry):
            return jax.lax.switch(opcodes[i], branches, carry, arg_idx[i])

        if stream.n_steps:
            ext, delta = jax.lax.fori_loop(0, stream.n_steps, body,
                                           (ext, delta))
        if self.n_tail:
            return ext, self._tail_dense_factor(ext)
        return ext

    def _factorize_sharded_stream_pallas(self, blocks, axis_name):
        """Gather-GEMM variant of the sharded stream (VERDICT r3 item 6):
        UPD chunks run ONE pallas kernel each (device-indexed runtime
        triples as scalar-prefetch operands, dst-sorted VMEM accumulation
        into the compact delta, combine='acc_add' — the psum applies the
        subtraction), TRSM chunks contract against a panel-inverse table
        maintained by the CHOL steps. REDUCE/APPLY (the frontal psum) and
        the batched Cholesky stay XLA — they are one op per level, not the
        per-chunk gather tax the kernels remove. Carry: (ext, Linv, delta).
        """
        from ..ops import pallas_supernodal as psn

        stream = self._get_sharded_stream(pallas=True)
        idx = jax.lax.axis_index(axis_name)
        D = self.n_shards
        b = self.b
        interp = jax.default_backend() != "tpu"
        cap = self._delta_cap
        eye = jnp.eye(b, dtype=jnp.float32)
        pad = jnp.stack([jnp.zeros((b, b), jnp.float32), eye])
        ext = jnp.concatenate([blocks, pad], 0)
        Linv = jnp.concatenate(
            [jnp.zeros((self.n, b, b), jnp.float32), eye[None]], 0
        )
        delta = jnp.zeros((cap + 1, b, b), jnp.float32)

        def upd(arr):
            a = jnp.asarray(arr)
            a = a.reshape(a.shape[0], D, 3, a.shape[2])

            def f(carry, ai):
                ext, Linv, delta = carry
                dstc, s1, s2 = a[ai][idx]
                delta = psn.gather_gemm(ext, ext, delta, s1, s2, dstc,
                                        op="mm_bt", combine="acc_add",
                                        interpret=interp)
                return (ext, Linv, delta)
            return f

        def reduce_(arr):
            def f(carry, ai):
                ext, Linv, delta = carry
                return (ext, Linv, jax.lax.psum(delta, axis_name))
            return f

        def apply_(arr):
            a = jnp.asarray(arr)

            def f(carry, ai):
                ext, Linv, delta = carry
                bids, drows = a[ai]
                ext = ext.at[bids].add(-delta[drows],
                                       indices_are_sorted=True)
                delta = delta.at[drows].set(
                    jnp.zeros((), jnp.float32), indices_are_sorted=True)
                return (ext, Linv, delta)
            return f

        n = self.n

        def chol(arr):
            a = jnp.asarray(arr)

            def f(carry, ai):
                ext, Linv, delta = carry
                cols = a[ai][0]
                Ld = sb.cholesky(ext[cols])
                ext = ext.at[cols].set(Ld, indices_are_sorted=True)
                Li = sb.solve_lower(Ld, jnp.broadcast_to(eye, Ld.shape))
                # pad cols (= T = n_blocks+1 > n) land on the Linv identity
                # trash row n, same as the single-device stream — an explicit
                # clamp rather than relying on scatter OOB-drop (ADVICE r4)
                Linv = Linv.at[jnp.minimum(cols, n)].set(
                    Li, indices_are_sorted=True)
                return (ext, Linv, delta)
            return f

        def trsm(arr):
            a = jnp.asarray(arr)

            def f(carry, ai):
                ext, Linv, delta = carry
                offs, od = a[ai]
                ext = psn.gather_gemm(ext, Linv, ext, offs, od, offs,
                                      op="mm_bt", combine="set",
                                      interpret=interp)
                return (ext, Linv, delta)
            return f

        mk = {"upd": upd, "reduce": reduce_, "apply": apply_, "chol": chol,
              "trsm": trsm}
        branches = [mk[kind](arr) for kind, arr in stream.branches]
        opcodes = jnp.asarray(stream.opcodes)
        arg_idx = jnp.asarray(stream.arg_idx)

        def body(i, carry):
            return jax.lax.switch(opcodes[i], branches, carry, arg_idx[i])

        if stream.n_steps:
            ext, Linv, delta = jax.lax.fori_loop(
                0, stream.n_steps, body, (ext, Linv, delta)
            )
        if self.n_tail:
            return ext, self._tail_dense_factor(ext)
        return ext

    def unpack(self, graph, x):
        """(n, b) solution in elimination positions -> delta dict."""
        x_var = x[jnp.asarray(self.pos)]
        out = {}
        for grp in self.groups:
            o = self.group_offset[grp]
            nn = self.group_sizes[grp]
            d = graph.manifolds[grp].dim
            out[grp] = x_var[o : o + nn, :d]
        return out


class ShardedAmalgamatedSupernodalSolver(ShardedSupernodalSolver,
                                         AmalgamatedSupernodalSolver):
    """P2 sharding at amalgamated supernode-PANEL granularity (SURVEY.md
    §2.2 S8 x §2.4 P2): w_max-wide panels (B = w_max * b_var — MXU-sized,
    and divisible by 8, so the pallas_stream gather-GEMM path applies) with
    the same per-level frontal-psum structure as the variable-level sharded
    solver. MRO runs the amalgamated symbolic setup first, then the sharded
    __init__ slices its panel-level schedules and variable-block assembly
    tables per device."""

    def unpack(self, graph, x):
        """(n_s, B) panel solution -> delta dict (panel slot unpacking)."""
        b = self.b_var
        ar = jnp.arange(b)
        xv = x[self._g_row[:, None], self._g_col[:, None] + ar]
        x_var = xv[jnp.asarray(self.pos)]
        out = {}
        for grp in self.groups:
            o = self.group_offset[grp]
            nn = self.group_sizes[grp]
            d = graph.manifolds[grp].dim
            out[grp] = x_var[o : o + nn, :d]
        return out


def lm_solve_supernodal_sharded(
    graph,
    values0,
    mesh: Optional[Mesh] = None,
    config: LMConfig = LMConfig(),
    axis_name: str = "node",
    mode: str = "auto",
    w_max: Optional[int] = None,
    ordering: Optional[str] = None,
    dense_tail: int = 0,
    pallas_stream: Optional[bool] = None,
):
    """Full LM with supernode-sharded factorization + factor-sharded
    assembly over the mesh. Returns (values, SolveStats).

    w_max: amalgamate etree chains into w_max-wide supernode panels before
    sharding (B = w_max * b_var — the MXU-sized granularity; required for
    pallas_stream on b_var that is not a multiple of 8). pallas_stream:
    route the streamed factorization's UPD/TRSM chunks through the
    gather-GEMM kernels (auto: TPU backend + compatible panel size)."""
    from ..solve.lm import _lm_loop

    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    gp = pad_graph(graph, n_dev)
    if w_max:
        sn = ShardedAmalgamatedSupernodalSolver(
            gp, values0, n_dev, pallas_stream=pallas_stream, w_max=w_max,
            ordering=ordering or "nd", mode=mode, dense_tail=dense_tail,
        )
    else:
        kw = {"ordering": ordering} if ordering else {}
        sn = ShardedSupernodalSolver(
            gp, values0, n_dev, pallas_stream=pallas_stream, mode=mode,
            dense_tail=dense_tail, **kw,
        )
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype

    graph_specs = jax.tree_util.tree_map(lambda _: P(axis_name), gp)
    values_specs = jax.tree_util.tree_map(lambda _: P(), values0)
    from .mesh import global_put

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
            L = sn.factorize_sharded(blocks, axis_name)
            x = sn.solve_factored(L, -g)
            return sn.unpack(gp, x)

        def retract_fn(values, delta):
            return graphlib.retract_all(graph_local, values, delta)

        return _lm_loop(values_rep, error_fn, step_fn, retract_fn, config,
                        dtype)

    return jax.jit(run)(gp, values0)
