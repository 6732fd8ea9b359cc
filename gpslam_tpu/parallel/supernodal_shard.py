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
from ..ops.supernodal import SupernodalSolver
from .mesh import make_mesh
from .solve import _stats_struct, pad_graph


class ShardedSupernodalSolver(SupernodalSolver):
    """SupernodalSolver + per-level sharded schedules for n_shards devices.

    Build on the PADDED graph (factor counts divisible by n_shards); the
    sharded methods are meant to be called inside a shard_map region over
    `axis_name` with the graph's factor tables sharded along that axis.
    """

    def __init__(self, graph, values, n_shards: int, **solver_kw):
        super().__init__(graph, values, **solver_kw)
        self.n_shards = n_shards

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
        # shard_map's placement)
        self.assembly_sh = []
        for pairs in self.assembly:
            sh_pairs = []
            for s, t, dst, transpose, keep in pairs:
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
                    keep,
                ))
            self.assembly_sh.append(sh_pairs)

    # ------------------------------------------------------------ sharded
    def assemble_local(self, graph_local, lins_local, values, axis_name):
        """Local partial (blocks, g) from this device's factor shard;
        caller psums. Gradient gathers use the local idx arrays directly;
        Hessian destinations come from this device's slice of the tables."""
        idx = jax.lax.axis_index(axis_name)
        assembly = [
            [(s, t, dst2d[idx], tr2d[idx], keep)
             for (s, t, dst2d, tr2d, keep) in pairs]
            for pairs in self.assembly_sh
        ]
        return self.assemble_raw(graph_local, lins_local, values,
                                 assembly=assembly)

    def factorize_sharded(self, blocks, axis_name):
        """Level-batched factorization with the update work sharded over
        `axis_name`; one compact psum per level (frontal reduction)."""
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
        return blocks

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


def lm_solve_supernodal_sharded(
    graph,
    values0,
    mesh: Optional[Mesh] = None,
    config: LMConfig = LMConfig(),
    axis_name: str = "node",
):
    """Full LM with supernode-sharded factorization + factor-sharded
    assembly over the mesh. Returns (values, SolveStats)."""
    from ..solve.lm import _lm_loop

    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    gp = pad_graph(graph, n_dev)
    sn = ShardedSupernodalSolver(gp, values0, n_dev)
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
