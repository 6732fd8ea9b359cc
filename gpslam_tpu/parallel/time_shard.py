"""Trajectory (time-axis) sharding — SURVEY.md §2.4 P4 / §5.7: the
sequence-parallel path, the framework's ring-attention analog.

`spike_solve` is a distributed SPD block-tridiagonal solve over a 1-D mesh
axis: each device holds a contiguous chunk of the chain (D, U, r sharded on
the leading axis inside shard_map) and

  1. eliminates its chunk INTERIOR with a local BCR solve, carrying the
     right-hand sides plus one b-column block per boundary (the classic
     SPIKE / substructuring reduction);
  2. all_gathers the 2-per-device reduced boundary blocks into a tiny
     (2*n_dev, b, b) block-tridiagonal system, solved REPLICATED by BCR
     (payload per device: O(b^2) — the "halo" is two states wide);
  3. back-substitutes its interior locally.

Communication per solve: ONE all_gather of the reduced system — lowered by
XLA to ICI. Composes with the landmark Schur complement by carrying the
H_sl columns as extra right-hand sides, exactly like ops/tridiag.py.
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
from ..graph.graph import FactorBatch, Graph
from ..ops import smallblock as sb
from ..ops.tridiag import bcr_solve


def spike_solve(D_loc, U_loc, r_loc, axis_name: str,
                use_rdma: bool = False, rdma_interpret: bool = False):
    """Distributed solve inside shard_map: each device passes ITS chunk.

    D_loc (m, b, b), U_loc (m, b, b) — U_loc[j] couples local j to j+1;
    U_loc[m-1] couples to the NEXT device's first state (zero on the last
    device). r_loc (m, b, k). Returns x_loc (m, b, k). Requires m >= 4.

    use_rdma routes the boundary-system gather through the Pallas RDMA
    ring (parallel/rdma.py, §5.8d) instead of XLA's all_gather;
    rdma_interpret simulates the DMAs (CPU-mesh tests).
    """
    m, b_dim, _ = D_loc.shape
    k = r_loc.shape[-1]
    if m < 4:
        raise ValueError(f"chunk length {m} < 4; repartition the chain")
    n_dev = jax.lax.psum(1, axis_name)
    c = jax.lax.axis_index(axis_name)

    # ---- 1. interior elimination (local states 1..m-2)
    D_int = D_loc[1:-1]
    U_int = jnp.concatenate(
        [U_loc[1 : m - 2], jnp.zeros((1, b_dim, b_dim), D_loc.dtype)], 0
    )
    # coupling columns: interior row 0 <- boundary 0 via U_loc[0]^T;
    # interior row m-3 <- boundary m-1 via U_loc[m-2]
    E_L = jnp.zeros((m - 2, b_dim, b_dim), D_loc.dtype).at[0].set(
        jnp.swapaxes(U_loc[0], -1, -2)
    )
    E_R = jnp.zeros((m - 2, b_dim, b_dim), D_loc.dtype).at[m - 3].set(
        U_loc[m - 2]
    )
    rhs = jnp.concatenate([r_loc[1:-1], E_L, E_R], axis=-1)
    sol = bcr_solve(D_int, U_int, rhs)
    z = sol[..., :k]  # H_int^{-1} g_int
    Y_L = sol[..., k : k + b_dim]  # H_int^{-1} E_L
    Y_R = sol[..., k + b_dim :]  # H_int^{-1} E_R

    # ---- 2. reduced boundary system (2 nodes per device)
    D0r = D_loc[0] - sb.matmul_hp(U_loc[0], Y_L[0])
    W = -sb.matmul_hp(U_loc[0], Y_R[0])  # own-boundary coupling b0 <-> b1
    UT = jnp.swapaxes(U_loc[m - 2], -1, -2)
    D1r = D_loc[m - 1] - sb.matmul_hp(UT, Y_R[m - 3])
    g0r = r_loc[0] - sb.matmul_hp(U_loc[0], z[0])
    g1r = r_loc[m - 1] - sb.matmul_hp(UT, z[m - 3])

    D_red_loc = jnp.stack([D0r, D1r], 0)  # (2, b, b)
    U_red_loc = jnp.stack([W, U_loc[m - 1]], 0)  # (2, b, b)
    g_red_loc = jnp.stack([g0r, g1r], 0)  # (2, b, k)

    if use_rdma:
        from . import rdma

        payload = jnp.concatenate(
            [D_red_loc.reshape(2, -1), U_red_loc.reshape(2, -1),
             g_red_loc.reshape(2, -1)], axis=-1,
        )
        gathered = rdma.ring_all_gather(payload, axis_name, int(n_dev),
                                        interpret=rdma_interpret,
                                        collective_id=21)
        gathered = gathered.reshape(2 * n_dev, -1)
        bb = b_dim * b_dim
        D_red = gathered[:, :bb].reshape(2 * n_dev, b_dim, b_dim)
        U_red = gathered[:, bb : 2 * bb].reshape(2 * n_dev, b_dim, b_dim)
        g_red = gathered[:, 2 * bb :].reshape(2 * n_dev, b_dim, k)
    else:
        D_red = jax.lax.all_gather(D_red_loc, axis_name).reshape(
            2 * n_dev, b_dim, b_dim
        )
        U_red = jax.lax.all_gather(U_red_loc, axis_name).reshape(
            2 * n_dev, b_dim, b_dim
        )
        g_red = jax.lax.all_gather(g_red_loc, axis_name).reshape(
            2 * n_dev, b_dim, k
        )

    x_red = bcr_solve(D_red, U_red, g_red)  # replicated tiny solve
    x0 = x_red[2 * c]
    x1 = x_red[2 * c + 1]

    # ---- 3. local back-substitution
    x_int = z - sb.matmul_hp(Y_L, x0[None]) - sb.matmul_hp(Y_R, x1[None])
    return jnp.concatenate([x0[None], x_int, x1[None]], 0)


def spike_schur_arrowhead_solve(D_loc, U_loc, g_loc, H_sl_loc, H_ll, g_l,
                                lam, axis_name: str,
                                use_rdma: bool = False,
                                rdma_interpret: bool = False):
    """Distributed chain + replicated-landmark arrowhead solve (the sharded
    twin of ops.tridiag.schur_arrowhead_solve).

    D/U/g/H_sl sharded by time chunk; H_ll (P, P) and g_l (P,) replicated.
    Returns (ds_loc (m, b), dl (P,) replicated).
    """
    m, b_dim, _ = D_loc.shape
    P = g_l.shape[0]
    dtype = D_loc.dtype
    D_damped = D_loc + lam * jnp.eye(b_dim, dtype=dtype)
    H_ll_damped = H_ll + lam * jnp.eye(P, dtype=dtype)

    rhs = jnp.concatenate([g_loc[..., None], H_sl_loc], axis=-1)
    sol = spike_solve(D_damped, U_loc, rhs, axis_name, use_rdma=use_rdma,
                      rdma_interpret=rdma_interpret)
    z = sol[..., 0]
    Y = sol[..., 1:]

    S_part = jnp.einsum("nbp,nbq->pq", H_sl_loc, Y, precision="highest")
    rl_part = jnp.einsum("nbp,nb->p", H_sl_loc, z, precision="highest")
    S_sum, rl_sum = jax.lax.psum((S_part, rl_part), axis_name)
    S = H_ll_damped - S_sum
    rhs_l = -g_l + rl_sum
    L_S = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(L_S, rhs_l[:, None], lower=True)
    dl = jax.scipy.linalg.solve_triangular(L_S.T, y, lower=False)[:, 0]

    ds = -z - jnp.einsum("nbp,p->nb", Y, dl, precision="highest")
    return ds, dl


# --------------------------------------------------------------------------
# Full time-sharded LM: trajectory chunks per device, halo exchange of the
# neighbor boundary state (SURVEY.md §5.7 mechanism 1 — the ring-attention
# neighbor-passing analog), local factor evaluation/assembly, SPIKE solve.
# --------------------------------------------------------------------------


def partition_chain_graph(graph: Graph, n_dev: int, m: int, state_group: str,
                          lm_group: Optional[str]) -> Graph:
    """Host-side: regroup every factor batch by time chunk with LOCAL state
    indices (halo state = local index m), padded per chunk and stacked so
    axis 0 shards evenly over the mesh.

    Factor -> chunk assignment: by the FIRST state slot's index (two-state
    factors are (i, i+1), so only the chunk's last factor touches the halo).
    Landmark-only batches are assigned to chunk 0 (contributions are psum'd).
    """
    new_batches = []
    for b in graph.batches:
        idx = [np.asarray(ix) for ix in b.idx]
        state_slots = [s for s, g in enumerate(b.groups) if g == state_group]
        M = idx[0].shape[0]
        if state_slots:
            chunk = idx[state_slots[0]] // m
        else:
            chunk = np.zeros(M, np.int64)  # landmark-only -> chunk 0
        mask0 = np.ones(M) if b.mask is None else np.asarray(b.mask)
        per_chunk = [np.nonzero(chunk == c)[0] for c in range(n_dev)]
        M_max = max(1, max(len(p) for p in per_chunk))
        # padded rows must satisfy the chain structure (state slot k gets
        # default local index k, so j = i + 1 holds and the role-table
        # check passes; the mask zeroes their contribution)
        idx_new = []
        for s in range(len(idx)):
            default = state_slots.index(s) if s in state_slots else 0
            idx_new.append(np.full((n_dev, M_max), default, np.int64))
        mask_new = np.zeros((n_dev, M_max))
        params_flat, treedef = jax.tree_util.tree_flatten(b.params)
        params_np = [np.asarray(x) for x in params_flat]
        # pad with COPIES of factor 0's params, not zeros: zero params can be
        # singular (dt=0 -> 1/dt = inf) and NaN poisons the masked residual
        # (NaN * 0 == NaN)
        params_new = [np.broadcast_to(x[0], (n_dev, M_max) + x.shape[1:]).copy()
                      for x in params_np]
        for c, rows in enumerate(per_chunk):
            k = len(rows)
            if k == 0:
                continue
            for s in range(len(idx)):
                v = idx[s][rows]
                if s in state_slots:
                    v = v - c * m  # local; the halo lands at exactly m
                idx_new[s][c, :k] = v
            mask_new[c, :k] = mask0[rows]
            for pi, x in enumerate(params_np):
                params_new[pi][c, :k] = x[rows]
        idx_final = tuple(
            jnp.asarray(a.reshape(n_dev * M_max), jnp.int32) for a in idx_new
        )
        params_final = jax.tree_util.tree_unflatten(
            treedef,
            [jnp.asarray(a.reshape((n_dev * M_max,) + a.shape[2:]))
             for a in params_new],
        )
        new_batches.append(
            FactorBatch(
                idx=idx_final, params=params_final, name=b.name,
                residual=b.residual, groups=b.groups, rdim=b.rdim,
                mask=jnp.asarray(mask_new.reshape(n_dev * M_max), jnp.float32),
                robust=b.robust, linearizer=b.linearizer,
            )
        )
    return Graph(batches=tuple(new_batches), manifolds=graph.manifolds)


def lm_solve_time_sharded(
    graph: Graph,
    values0,
    mesh: Mesh,
    config: LMConfig = LMConfig(),
    state_group: str = "state",
    lm_group: Optional[str] = "landmark",
    axis_name: str = "time",
    use_rdma: bool = False,
    rdma_interpret: bool = False,
):
    """LM with the TRAJECTORY sharded over the mesh (P4): per iteration, one
    ppermute halo exchange of the neighbor boundary state, local
    linearization/assembly of the chunk's factors, a boundary-contribution
    ppermute, and the distributed SPIKE+Schur solve. Landmarks replicated.

    Requires n_states %% n_dev == 0 and chunk length >= 4. Chain-structured
    graphs only (same contract as ops/chain.py).

    use_rdma swaps every neighbor/boundary collective for its Pallas RDMA
    ring twin (parallel/rdma.py, SURVEY.md §5.8d) — halo exchange,
    boundary send-back, and the SPIKE gather; the default keeps the XLA
    collectives (the mandated fallback). rdma_interpret runs the ring
    kernels in interpret mode (CPU-mesh testing).

    Arbitrary trajectory lengths are accepted: if n_states is not divisible
    by n_dev (or chunks would be shorter than the SPIKE minimum of 4), the
    trajectory is padded with copies of the last state. Padded states touch
    no factors (their Hessian rows are identity-anchored inside the solve,
    their gradient rows are zero, so their update is exactly zero and chi^2
    is untouched); results are trimmed back before returning.
    """
    from ..ops import chain as chain_ops
    from ..solve.lm import _lm_loop

    n_dev = mesh.devices.size
    N = jax.tree_util.tree_leaves(values0[state_group])[0].shape[0]
    N_orig = N
    m = max(4, -(-N // n_dev))
    if m * n_dev != N:
        pad = m * n_dev - N
        values0 = dict(values0)
        values0[state_group] = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], 0
            ),
            values0[state_group],
        )
        N = m * n_dev
    if lm_group is not None and lm_group not in graph.manifolds:
        lm_group = None
    chain_ops.build_role_table(graph, state_group, lm_group)  # structure check
    gp = partition_chain_graph(graph, n_dev, m, state_group, lm_group)
    roles = None  # recomputed below on the partitioned graph (local indices
    # keep j = i + 1, so the role table is structurally identical)
    roles = chain_ops.build_role_table(gp, state_group, lm_group)
    man = graph.manifolds[state_group]
    b_dim = man.dim
    dtype = jax.tree_util.tree_leaves(values0)[0].dtype

    graph_specs = jax.tree_util.tree_map(lambda _: P(axis_name), gp)
    values_specs = {
        g: jax.tree_util.tree_map(
            lambda _: P(axis_name) if g == state_group else P(), v
        )
        for g, v in values0.items()
    }
    from .mesh import global_put
    from .solve import _stats_struct

    gp = global_put(gp, mesh, graph_specs)
    values0 = global_put(values0, mesh, values_specs)
    out_specs = (values_specs, jax.tree_util.tree_map(
        lambda _: P(), _stats_struct(config, dtype)))

    def _halo(values_loc):
        """Append the right neighbor's first state as local slot m."""
        state = values_loc[state_group]
        if use_rdma:
            from . import rdma

            cid = iter(range(30, 60))
            halo = jax.tree_util.tree_map(
                lambda a: rdma.ring_shift(a[:1], axis_name, shift=-1,
                                          interpret=rdma_interpret,
                                          collective_id=next(cid)),
                state,
            )
        else:
            perm = [((c + 1) % n_dev, c) for c in range(n_dev)]
            halo = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a[:1], axis_name, perm), state
            )
        ext = jax.tree_util.tree_map(
            lambda a, h: jnp.concatenate([a, h], 0), state, halo
        )
        return dict(values_loc, **{state_group: ext})

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(graph_specs, values_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    def run(graph_loc: Graph, values_loc):
        L = (jax.tree_util.tree_leaves(values_loc[lm_group])[0].shape[0]
             if lm_group else 0)

        def error_fn(vals):
            ext = _halo(vals)
            total = jnp.zeros((), dtype)
            for bt in graph_loc.batches:
                r = graphlib.batch_residuals(bt, ext)
                total = total + 0.5 * jnp.sum(r * r)
            return jax.lax.psum(total, axis_name)

        def step_fn(vals, lam):
            ext = _halo(vals)
            lins = graphlib.linearize(graph_loc, ext)
            D, U, g_s, H_sl, H_ll, g_l = chain_ops.assemble_chain(
                graph_loc, lins, ext, roles, state_group, lm_group
            )
            # D/U/g/H_sl have m+1 rows; row m belongs to the right
            # neighbor's first state -> ppermute it back and add
            perm_back = [(c, (c + 1) % n_dev) for c in range(n_dev)]
            cid_back = iter(range(60, 90))

            def send_back(a):
                if use_rdma:
                    from . import rdma

                    recv = rdma.ring_shift(a[m:m + 1], axis_name, shift=1,
                                           interpret=rdma_interpret,
                                           collective_id=next(cid_back))
                else:
                    recv = jax.lax.ppermute(a[m:m + 1], axis_name, perm_back)
                return a[:m].at[0].add(recv[0])

            D = send_back(D)
            g_s = send_back(g_s)
            # U[m-1] couples to the halo (the SPIKE cross-chunk coupling);
            # U[m] would couple halo->halo+1 and is structurally zero.
            U = U[:m]
            # zero the wrap-around coupling on the last device
            c_id = jax.lax.axis_index(axis_name)
            U = U.at[m - 1].multiply(
                jnp.where(c_id == n_dev - 1, 0.0, 1.0).astype(dtype)
            )
            if N_orig != N:
                # identity-anchor padded states (no factors touch them, so
                # their D rows are zero and their g rows are zero: the
                # anchored solve yields delta == 0 there)
                is_pad = (c_id * m + jnp.arange(m) >= N_orig).astype(dtype)
                D = D + is_pad[:, None, None] * jnp.eye(b_dim, dtype=dtype)
            lam = jnp.asarray(lam, dtype)
            if lm_group is None:
                D_damped = D + lam * jnp.eye(b_dim, dtype=dtype)
                ds = -spike_solve(
                    D_damped, U, g_s[..., None], axis_name,
                    use_rdma=use_rdma, rdma_interpret=rdma_interpret,
                )[..., 0]
                return {state_group: ds}
            H_sl = send_back(H_sl)
            H_ll, g_l = jax.lax.psum((H_ll, g_l), axis_name)
            ds, dl = spike_schur_arrowhead_solve(
                D, U, g_s, H_sl, H_ll, g_l, lam, axis_name,
                use_rdma=use_rdma, rdma_interpret=rdma_interpret,
            )
            return {
                state_group: ds,
                lm_group: dl.reshape(L, graph_loc.manifolds[lm_group].dim),
            }

        def retract_fn(vals, delta):
            out = {}
            for g, v in vals.items():
                out[g] = jax.vmap(graph_loc.manifolds[g].retract)(v, delta[g])
            return out

        return _lm_loop(values_loc, error_fn, step_fn, retract_fn, config,
                        dtype)

    vals_out, stats = jax.jit(run)(gp, values0)
    if N_orig != N:
        vals_out = dict(vals_out)
        vals_out[state_group] = jax.tree_util.tree_map(
            lambda a: a[:N_orig], vals_out[state_group]
        )
    return vals_out, stats
