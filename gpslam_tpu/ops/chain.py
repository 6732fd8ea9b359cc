"""Chain-structured assembly: linearized batches -> (block-tridiag + arrowhead)
system for the BCR/Schur solver (SURVEY.md §7 "second slice": scan+Schur path
covers Plaza-sized problems without general sparse Cholesky).

Structural contract (checked host-side in make_chain_solver, where index
arrays are concrete): every factor batch touches either
  - one state slot                       -> diagonal block
  - two state slots with idx_j = idx_i+1 -> diagonal + super-diagonal blocks
  - any of the above plus landmark slots -> arrowhead blocks
Loop closures (arbitrary i-j coupling) violate the contract; use the dense or
PCG backend for those graphs.

The check produces a STATIC role table (slot-pair -> which block structure to
scatter into); inside jit the assembler only consults the table — no data-
dependent branching. All scatters are `at[].add` with int32 index arrays —
the TPU equivalent of GTSAM's gather into frontal matrices (ref S6/S9).
"""

from __future__ import annotations

import dataclasses
import hashlib
import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from . import tridiag

# role table entry values
_DIAG = "diag"
_SUPER = "super"  # (s, t) with idx_t = idx_s + 1
_SKIP = "skip"  # lower-triangle duplicate, implicit by symmetry
_SL = "state_lm"
_LL = "lm_lm"
_LS = "lm_state"  # implicit by symmetry


def build_role_table(graph: Graph, state_group: str, lm_group: Optional[str]):
    """Host-side structural analysis (concrete index arrays required)."""
    roles = []
    for b in graph.batches:
        other = [g for g in b.groups if g not in (state_group, lm_group)]
        if other:
            raise ValueError(
                f"batch {b.name!r} touches groups {other} unsupported by the "
                f"chain solver"
            )
        state_slots = [s for s, g in enumerate(b.groups) if g == state_group]
        if len(state_slots) > 2:
            raise ValueError(f"batch {b.name!r} has >2 state slots")
        if len(state_slots) == 2:
            i = np.asarray(b.idx[state_slots[0]])
            j = np.asarray(b.idx[state_slots[1]])
            if not np.all(j == i + 1):
                raise ValueError(
                    f"batch {b.name!r} couples non-adjacent states; the chain "
                    f"solver requires j = i+1 (use the dense/PCG backend)"
                )
        table: Dict[Tuple[int, int], str] = {}
        for s, gs_name in enumerate(b.groups):
            for t, gt_name in enumerate(b.groups):
                if gs_name == state_group and gt_name == state_group:
                    if s == t:
                        table[(s, t)] = _DIAG
                    elif state_slots.index(s) == 0 and state_slots.index(t) == 1:
                        table[(s, t)] = _SUPER
                    else:
                        table[(s, t)] = _SKIP
                elif gs_name == state_group:
                    table[(s, t)] = _SL
                elif gt_name == state_group:
                    table[(s, t)] = _LS
                else:
                    table[(s, t)] = _LL
        roles.append(table)
    return roles


# ---------------------------------------------------------------------------
# Scatter-free assembly plans (TPU fast path).
#
# TPU scatter-add (`at[idx].add`) serializes on colliding indices and lowers
# to a slow generic scatter even when the indices are a contiguous arange.
# Measured at 100k states (v5e): the scatter assembler costs 44.6 ms per LM
# iteration vs ~3 ms of actual HBM traffic — it was the dominant stage of the
# whole solve. The plans below remove every scatter from chain assembly:
#
#   slice      idx == arange(k0, k0+M): the contribution IS a contiguous row
#              range -> zero-pad to the target length and add (pure dense,
#              XLA fuses pad+add into one elementwise pass).
#   gatherpad  duplicate/unsorted idx: host-side, assign each factor a
#              repetition slot r < R (R = max factors per row) and build a
#              (rows, R) gather table into the contribution array (index M =
#              zero trash row). Assembly = one dense GATHER + sum over R.
#   scatter    fallback when padding would blow up (rows*R >> M).
#
# Landmark-slot contributions don't need host tables at all: with L landmarks
# (static at trace time) the scatter is a one-hot matmul — W = onehot(idx, L),
# g_l += W^T r, H_ll += einsum(W,W,blk) — which runs on the MXU and is exact
# in the same dtype. Used when L <= _ONEHOT_MAX_L.
#
# Plans require CONCRETE index arrays at build time and bind the plan to
# those indices; callers whose idx arrays are runtime data (sharded local
# graphs, rolling smoother windows) keep passing the plain role table and get
# the original scatter path. `make_chain_solver` (the single-device fast
# path) builds plans automatically.
# ---------------------------------------------------------------------------

# one-hot landmark assembly is gated on the size of its densified
# intermediates (M_eff * L * b * dl floats — the advisor-flagged worst case,
# the H_sl outer-product densify), NOT on L alone: a small-L/huge-M batch can
# blow HBM just as well as a large-L one. Beyond the budget the batch falls
# back to the colliding scatter-add path — correct but slow (the measured
# 44.6 ms/iter pathology at 100k states) — and says so via warnings.warn at
# trace time so the regression is never silent.
_ONEHOT_BYTES_MAX = 1 << 30


@dataclasses.dataclass(frozen=True)
class SlotPlan:
    mode: str  # "slice" | "gatherpad" | "scatter"
    start: int = 0
    rows: int = 0
    pad_idx: Optional[np.ndarray] = None  # (rows, R) int32, value M = trash

    @property
    def eff_rows(self) -> int:
        """Densified row count of this plan's intermediates (M for slice,
        rows*R for gatherpad)."""
        if self.mode == "gatherpad":
            return int(self.pad_idx.shape[0] * self.pad_idx.shape[1])
        return self.rows


@dataclasses.dataclass(frozen=True)
class ChainPlan:
    """Role tables + per-(batch, state-slot) scatter plans.

    BOUND to the concrete index arrays it was built from: the slice starts,
    gatherpad tables and super-diagonal roles bake those values in, so a
    plan is only valid for graphs whose state-slot idx arrays are equal to
    the build-time ones (idx_digest). assemble_chain verifies the digest
    whenever the call-time idx arrays are concrete."""

    roles: list
    slot_plans: list  # per batch: {slot: SlotPlan} for state slots only
    use_onehot_lm: bool = True
    idx_digest: Optional[tuple] = None  # per batch: {slot: blake2b digest}


def _digest(idx: np.ndarray) -> bytes:
    return hashlib.blake2b(
        np.ascontiguousarray(np.asarray(idx, np.int64)).tobytes(),
        digest_size=16,
    ).digest()


_warned_all_traced = False


def _verify_plan_binding(plan: "ChainPlan", graph: Graph):
    """Trace-time guard (ADVICE r3): a jitted solver carrying a ChainPlan is
    value-correct only for the graph the plan was built from. When the
    call-time idx arrays are concrete (the normal case — idx is host numpy),
    check them against the build-time digests; traced idx (runtime index
    data) CANNOT be checked — if every idx is traced (e.g. the graph rides as
    a jit argument), the binding goes entirely unverified and a once-per-
    process warning says so (ADVICE r4)."""
    global _warned_all_traced
    if plan.idx_digest is None:
        return
    if len(graph.batches) != len(plan.idx_digest):
        raise ValueError(
            f"chain plan mismatch: graph has {len(graph.batches)} factor "
            f"batches but the plan was built for {len(plan.idx_digest)} — "
            f"rebuild with make_chain_solver(graph)"
        )
    checked = skipped = 0
    for bi, batch in enumerate(graph.batches):
        for s, dig in plan.idx_digest[bi].items():
            if s >= len(batch.idx):
                raise ValueError(
                    f"chain plan mismatch: batch {batch.name!r} has no slot "
                    f"{s} the plan was built against — rebuild with "
                    f"make_chain_solver(graph)"
                )
            ix = batch.idx[s]
            if isinstance(ix, jax.core.Tracer):
                skipped += 1
                continue
            checked += 1
            if _digest(ix) != dig:
                raise ValueError(
                    f"chain plan mismatch: batch {batch.name!r} slot {s} has "
                    f"different index values than the graph this solver was "
                    f"built for — rebuild with make_chain_solver(graph) (the "
                    f"plan bakes slice/gather tables for the build-time idx)"
                )
    if skipped and not checked and not _warned_all_traced:
        _warned_all_traced = True
        warnings.warn(
            "chain plan binding could not be verified: every idx array is "
            "traced (graph passed as a jit argument), so the digest check is "
            "skipped — the plan is only value-correct for the graph it was "
            "built from (make_chain_solver docstring)", stacklevel=3,
        )


def _make_slot_plan(idx: np.ndarray) -> SlotPlan:
    idx = np.asarray(idx, np.int64)
    M = idx.shape[0]
    if M == 0:
        return SlotPlan("slice", start=0)
    if np.array_equal(idx, np.arange(idx[0], idx[0] + M)):
        return SlotPlan("slice", start=int(idx[0]))
    rows = int(idx.max()) + 1
    counts = np.bincount(idx, minlength=rows)
    R = int(counts.max())
    if rows * R > 8 * M + 1024:  # padding blowup: stay on scatter
        return SlotPlan("scatter")
    order = np.argsort(idx, kind="stable")
    si = idx[order]
    rank = np.arange(M) - np.searchsorted(si, si, side="left")
    pad = np.full((rows, R), M, np.int32)
    pad[si, rank] = order.astype(np.int32)
    return SlotPlan("gatherpad", rows=rows, pad_idx=pad)


def build_chain_plan(graph: Graph, state_group: str,
                     lm_group: Optional[str]) -> ChainPlan:
    """Host-side: role tables + scatter-free assembly plans (concrete idx)."""
    roles = build_role_table(graph, state_group, lm_group)
    slot_plans = []
    digests = []
    for b in graph.batches:
        plans = {}
        digs = {}
        for s, g in enumerate(b.groups):
            if g == state_group:
                plans[s] = _make_slot_plan(np.asarray(b.idx[s]))
                digs[s] = _digest(b.idx[s])
        slot_plans.append(plans)
        digests.append(digs)
    return ChainPlan(roles=roles, slot_plans=slot_plans,
                     idx_digest=tuple(digests))


def _padded_rows(contrib, rows_total, start):
    """Embed (M, ...) rows at [start, start+M) of a rows_total-long axis."""
    M = contrib.shape[0]
    pad = [(start, rows_total - start - M)] + [(0, 0)] * (contrib.ndim - 1)
    return jnp.pad(contrib, pad)


def _apply_rows(target, contrib, plan: SlotPlan, idx):
    """target[plan rows] += contrib, scatter-free where the plan allows."""
    if plan.mode == "slice":
        return target + _padded_rows(contrib, target.shape[0], plan.start)
    if plan.mode == "gatherpad":
        src = jnp.concatenate([contrib, jnp.zeros_like(contrib[:1])], 0)
        dense = src[plan.pad_idx].sum(axis=1)  # (rows, ...)
        return target + _padded_rows(dense, target.shape[0], 0)
    return target.at[idx].add(contrib)


def _gatherpad_pair(blk, W, plan: SlotPlan):
    """Densify (blk, W) over the plan's rows: returns (rows,R,...) pairs."""
    src_b = jnp.concatenate([blk, jnp.zeros_like(blk[:1])], 0)
    src_w = jnp.concatenate([W, jnp.zeros_like(W[:1])], 0)
    return src_b[plan.pad_idx], src_w[plan.pad_idx]


def assemble_chain(graph: Graph, lins, values, roles, state_group: str,
                   lm_group: Optional[str]):
    """Returns (D (N,b,b), U (N,b,b; U[N-1]=0), g_s (N,b),
                H_sl (N,b,P), H_ll (P,P), g_l (P,)); landmark parts None
    when lm_group is None.

    `roles` is either the plain role-table list (generic scatter path, valid
    for runtime index arrays) or a ChainPlan (scatter-free fast path bound to
    the concrete indices it was built from)."""
    plan = roles if isinstance(roles, ChainPlan) else None
    if plan is not None:
        _verify_plan_binding(plan, graph)
    role_tables = plan.roles if plan is not None else roles
    man = graph.manifolds[state_group]
    b_dim = man.dim
    N = jax.tree_util.tree_leaves(values[state_group])[0].shape[0]
    dtype = jax.tree_util.tree_leaves(values)[0].dtype

    D = jnp.zeros((N, b_dim, b_dim), dtype)
    U = jnp.zeros((N, b_dim, b_dim), dtype)
    g_s = jnp.zeros((N, b_dim), dtype)

    if lm_group is not None:
        lm_man = graph.manifolds[lm_group]
        dl = lm_man.dim
        L = jax.tree_util.tree_leaves(values[lm_group])[0].shape[0]
        P = L * dl
        H_sl = jnp.zeros((N, b_dim, L, dl), dtype)
        H_ll = jnp.zeros((L, dl, L, dl), dtype)
        g_l = jnp.zeros((L, dl), dtype)
    else:
        H_sl = H_ll = g_l = None

    itemsize = jnp.dtype(dtype).itemsize

    def onehot_ok(batch, sp):
        """Per-batch one-hot gate: densified intermediates within budget?
        Worst intermediate is the H_sl outer-product densify, (M_eff, b, L,
        dl) floats; M_eff accounts for gatherpad row expansion."""
        if plan is None or not plan.use_onehot_lm or lm_group is None:
            return False
        if lm_group not in batch.groups:
            return False  # no landmark slots: gate (and warning) irrelevant
        m_eff = batch.idx[0].shape[0]
        if sp:
            m_eff = max([batch.idx[0].shape[0]]
                        + [p.eff_rows for p in sp.values()
                           if p.mode == "gatherpad"])
        width = max(b_dim * dl, 1)
        if m_eff * L * width * itemsize > _ONEHOT_BYTES_MAX:
            warnings.warn(
                f"chain assembly: batch {batch.name!r} exceeds the one-hot "
                f"landmark budget ({m_eff} factors x {L} landmarks); falling "
                f"back to colliding scatter-add landmark assembly — expect "
                f"slow iterations (consider the supernodal backend for "
                f"landmark-rich graphs at this scale)",
                stacklevel=2,
            )
            return False
        return True

    for bi, (batch, lin, table) in enumerate(zip(graph.batches, lins,
                                                 role_tables)):
        sp = plan.slot_plans[bi] if plan is not None else None
        use_onehot = onehot_ok(batch, sp)
        onehots: Dict[int, jnp.ndarray] = {}

        def onehot(t, batch=batch, onehots=onehots):
            if t not in onehots:
                idx_t = batch.idx[t]
                onehots[t] = (
                    idx_t[:, None] == jnp.arange(L, dtype=idx_t.dtype)[None]
                ).astype(dtype)
            return onehots[t]

        for s, gs_name in enumerate(batch.groups):
            Js = lin.J[s]
            contrib_g = jnp.einsum("mri,mr->mi", Js, lin.r)
            if gs_name == state_group:
                if sp is not None:
                    g_s = _apply_rows(g_s, contrib_g, sp[s], batch.idx[s])
                else:
                    g_s = g_s.at[batch.idx[s]].add(contrib_g)
            elif use_onehot:
                g_l = g_l + jnp.einsum("ml,mi->li", onehot(s), contrib_g,
                                       precision="highest")
            else:
                g_l = g_l.at[batch.idx[s]].add(contrib_g)
            for t in range(len(batch.groups)):
                role = table[(s, t)]
                if role in (_SKIP, _LS):
                    continue
                blk = jnp.einsum("mri,mrj->mij", Js, lin.J[t])
                if role == _DIAG:
                    if sp is not None:
                        D = _apply_rows(D, blk, sp[s], batch.idx[s])
                    else:
                        D = D.at[batch.idx[s]].add(blk)
                elif role == _SUPER:
                    if sp is not None:
                        U = _apply_rows(U, blk, sp[s], batch.idx[s])
                    else:
                        U = U.at[batch.idx[s]].add(blk)
                elif role == _SL:
                    p = sp[s] if (sp is not None and use_onehot) else None
                    if p is not None and p.mode == "slice":
                        # one row per factor: outer-product densify, pad, add
                        dense = jnp.einsum("ml,mbd->mbld", onehot(t), blk)
                        H_sl = H_sl + _padded_rows(dense, N, p.start)
                    elif p is not None and p.mode == "gatherpad":
                        blk_d, W_d = _gatherpad_pair(blk, onehot(t), p)
                        dense = jnp.einsum("nrl,nrbd->nbld", W_d, blk_d,
                                           precision="highest")
                        H_sl = H_sl + _padded_rows(dense, N, 0)
                    else:
                        H_sl = H_sl.at[batch.idx[s], :, batch.idx[t], :].add(blk)
                elif role == _LL:
                    if use_onehot:
                        # lowered as dl^2 rank-contracted matmuls: the naive
                        # 'mp,mij,mq->piqj' einsum cannot contract m until
                        # two operands combine, so XLA materializes an
                        # O(M*L*dl^2) intermediate (ADVICE r3); the
                        # (W .* blk_ij)^T @ W form keeps the intermediate at
                        # O(M*L) and runs on the MXU.
                        Ws, Wt = onehot(s), onehot(t)
                        rows_ll = []
                        for ii in range(dl):
                            rows_ll.append(jnp.stack([
                                jnp.einsum(
                                    "mp,mq->pq",
                                    Ws * blk[:, ii, jj][:, None], Wt,
                                    precision="highest",
                                )
                                for jj in range(dl)
                            ]))
                        Hb = jnp.stack(rows_ll)  # (dl_i, dl_j, L, L)
                        H_ll = H_ll + Hb.transpose(2, 0, 3, 1)
                    else:
                        H_ll = H_ll.at[batch.idx[s], :, batch.idx[t], :].add(blk)

    if lm_group is not None:
        H_sl = H_sl.reshape(N, b_dim, P)
        H_ll = H_ll.reshape(P, P)
        g_l = g_l.reshape(P)
    return D, U, g_s, H_sl, H_ll, g_l


def make_chain_solver(graph: Graph, state_group: str = "state",
                      lm_group: Optional[str] = "landmark",
                      diagonal_damping: bool = False,
                      use_pallas: bool = False, pallas_min_n: int = 4096,
                      interpret: bool = False):
    """Build the chain+Schur linear solver after host-side structure checks.

    Returned callable matches the lm_solve solver interface:
    solver(graph, values, lins, lam) -> {group: (N_g, dim_g) delta}.

    The solver is BOUND to this graph's concrete index arrays: the
    scatter-free assembly plan bakes slice starts and gather tables for the
    build-time idx values, so calling it with a same-shape graph holding
    DIFFERENT indices is invalid (different landmark observation patterns,
    reordered factors). The binding is verified on a best-effort basis:
    assembly checks an idx digest at trace time and raises on mismatch, but
    ONLY for idx arrays that are concrete at trace time — runtime-traced idx
    (e.g. a graph passed as a jit argument, the dominant usage) skip the
    check, with a once-per-process warning when nothing could be verified.
    Callers with runtime index data should pass plain role tables instead.

    use_pallas routes the BCR through the fused plane-major Pallas level
    kernels (ops/pallas_bcr.py; f32, b <= 8, big chains only — measured
    2-4x over the XLA path at Plaza1x27..1M states on v5e). Small chains,
    f64, and b > 8 silently fall through to the XLA unrolled path, so the
    flag is always safe to set.
    """
    if lm_group is not None and lm_group not in graph.manifolds:
        lm_group = None
    # scatter-free assembly plans (bound to this graph's concrete indices;
    # measured 44.6 -> ~4 ms per LM iteration at 100k states on v5e)
    roles = build_chain_plan(graph, state_group, lm_group)

    def solver(graph, values, lins, lam):
        D, U, g_s, H_sl, H_ll, g_l = assemble_chain(
            graph, lins, values, roles, state_group, lm_group
        )
        dtype = D.dtype
        lam = jnp.asarray(lam, dtype)
        if lm_group is None:
            b = D.shape[-1]
            if diagonal_damping:
                dd = jnp.maximum(jnp.diagonal(D, axis1=-2, axis2=-1), 1e-10)
                D_damped = D + lam * jax.vmap(jnp.diag)(dd)
            else:
                D_damped = D + lam * jnp.eye(b, dtype=dtype)
            if use_pallas:
                from . import pallas_bcr

                ds = -pallas_bcr.bcr_solve_fused(
                    D_damped, U, g_s[..., None], interpret=interpret,
                )[..., 0]
            else:
                ds = -tridiag.bcr_solve(
                    D_damped, U, g_s[..., None],
                    pallas_min_n=pallas_min_n, interpret=interpret,
                )[..., 0]
            return {state_group: ds}
        ds, dl = tridiag.schur_arrowhead_solve(
            D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping,
            use_pallas=use_pallas, pallas_min_n=pallas_min_n,
            interpret=interpret,
        )
        lm_man = graph.manifolds[lm_group]
        return {
            state_group: ds,
            lm_group: dl.reshape(-1, lm_man.dim),
        }

    return solver
