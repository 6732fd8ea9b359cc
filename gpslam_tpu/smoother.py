"""Fixed-lag sliding-window smoother (SURVEY.md §2.2 S11).

The reference's incremental engine is iSAM2 — pointer-surgery on a Bayes
tree, hostile to XLA. The TPU-idiomatic replacement (BASELINE.json config 5
"sliding-window incremental smoothing") is a STATIC-SHAPE fixed-lag smoother:
a window of W chain states plus the landmark set, advanced one step per
`step()` call with zero recompiles:

  1. marginalize the oldest state onto (next state, landmarks) — dense Schur
     complement of the factors being dropped, stored as a relinearized
     ANCHOR factor r = A [local(mu, x); ...] + c (exact Gaussian marginal at
     the current linearization point, the standard fixed-lag approximation);
  2. roll the window arrays, predict the new head state through the GP mean
     Phi(dt), shift the measurement ring buffer (factor masks expire old
     measurements — no dynamic shapes anywhere);
  3. run K warm-started damped iterations with the BCR+Schur chain solver.

Cost per step is O(W log W), independent of total trajectory length — the
"cheap sequential updates" capability of iSAM2 without tree edits.

Supports two model classes via the `model` argument: "linear" (vector WNOA,
the Plaza workload) and "se2" (SE(2) pose + body velocity with GP-WNOA prior,
odometry, and interpolated range measurements). The anchor/marginalization
machinery is manifold-generic (it works in local coordinates).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import LMConfig
from .graph import manifolds
from .graph.graph import FactorBatch, Graph
from .factors import gp_priors, measurements
from .lie import se2 as se2_lie
from .ops import chain as chain_ops
from .ops import dense as dense_ops
from .ops import smallblock as sb
from .solve.lm import _lm_loop


def _tmap(f, *ts):
    return jax.tree_util.tree_map(f, *ts)


def _make_anchor_residual(state_manifold):
    """Joint Gaussian anchor on (head state, all landmarks):
    r = A [local(mu_state, state); l_0 - mu_l0; ...] + c.
    Manifold-generic: `local` handles Lie states and vector states alike."""

    def anchor(state, *args):
        *lms, params = args
        delta = jnp.concatenate(
            [state_manifold.local((params["mu_x"], params["mu_v"]), state)]
            + [lm - mu for lm, mu in zip(lms, params["mu_l"])]
        )
        return params["sqrt_info"] @ delta + params["offset"]

    return anchor


@struct.dataclass
class SmootherState:
    """All dynamic state of the smoother (a pytree; step() is jittable)."""

    x: jnp.ndarray  # (W, d) window positions
    v: jnp.ndarray  # (W, d) window velocities
    landmarks: jnp.ndarray  # (L, d)
    anchor_sqrt_info: jnp.ndarray  # (b+P, b+P)
    anchor_offset: jnp.ndarray  # (b+P,)
    anchor_mu_x: jnp.ndarray  # (d,)
    anchor_mu_v: jnp.ndarray  # (d,)
    anchor_mu_l: jnp.ndarray  # (L, d)
    odom_z: jnp.ndarray  # (W-1, d)
    odom_mask: jnp.ndarray  # (W-1,)
    rng_interval: jnp.ndarray  # (C,) int32 interval index (i, i+1)
    rng_lm: jnp.ndarray  # (C,) int32 landmark id
    rng_tau: jnp.ndarray  # (C,)
    rng_z: jnp.ndarray  # (C,)
    rng_mask: jnp.ndarray  # (C,)
    step_count: jnp.ndarray  # ()


@dataclasses.dataclass(frozen=True)
class SmootherConfig:
    window: int = 50
    ranges_per_step: int = 4  # ring-buffer insert width per step
    dt: float = 1.0
    qc: float = 0.1
    odom_sigma: float = 0.05
    range_sigma: float = 0.3
    iters_per_step: int = 2
    lambda_fixed: float = 1e-6  # small fixed damping for the warm-started GN
    odom_sigma_th: float = 0.0  # se2 model: rotation odometry sigma (0 -> odom_sigma)
    # Fluid-relinearization analog (reference: ISAM2Params.relinearizeThreshold,
    # SURVEY.md §2.2 S11): when iters_max_per_step > iters_per_step, each
    # step may take up to iters_max_per_step damped iterations but stops as
    # soon as the window chi^2 improves by less than relinearize_tol
    # (relative) — extra relinearizations happen exactly when the window
    # moved far from its linearization point (loop closures, fast turns),
    # and cost nothing in the steady state.
    iters_max_per_step: int = 0  # 0 -> = iters_per_step (fixed effort)
    relinearize_tol: float = 1e-3


class FixedLagSmoother:
    """Linear-WNOA fixed-lag smoother. Build once per (W, L, C) shape; all
    step() calls reuse one compiled XLA program."""

    def __init__(self, config: SmootherConfig, n_landmarks: int,
                 dtype=jnp.float32, model: str = "linear"):
        self.config = config
        self.n_landmarks = n_landmarks
        self.dtype = dtype
        self.model = model
        if model == "linear":
            self.d = 2  # landmark / measurement space dim
            state_man = manifolds.linear_state(2)
            self._gp_residual = gp_priors.gp_prior_linear
            self._odom_residual = measurements.between_linear
            self._range_residual = measurements.interp_range_linear
            self._qc_dim = 2
            self._odom_dim = 2
            self._predict = lambda x, v, dt: x + dt * v
        elif model == "se2":
            self.d = 2
            state_man = manifolds.se2_state()
            self._gp_residual = gp_priors.gp_prior_se2
            self._odom_residual = measurements.between_se2
            self._range_residual = measurements.interp_range_se2
            self._qc_dim = 3
            self._odom_dim = 3
            self._predict = lambda p, v, dt: se2_lie.retract(p, dt * v)
        elif model == "se3":
            from .lie import se3 as se3_lie

            self.d = 3
            state_man = manifolds.se3_state()
            self._gp_residual = gp_priors.gp_prior_se3
            self._odom_residual = measurements.between_se3
            self._range_residual = measurements.interp_range_se3
            self._qc_dim = 6
            self._odom_dim = 6
            self._predict = lambda p, v, dt: se3_lie.retract(*p, dt * v)
        else:
            raise ValueError(f"unknown smoother model {model!r}")
        self._pose_is_tuple = model == "se3"
        self.b = state_man.dim
        self.P = n_landmarks * self.d
        self.C = config.ranges_per_step * config.window
        self._man = {
            "state": state_man,
            "landmark": manifolds.Vector(self.d),
        }
        self._anchor_residual = _make_anchor_residual(state_man)
        self._roles()  # build the static role table EAGERLY (host-side):
        # inside the jit trace jnp constructors yield tracers and the
        # structural check would fail
        self._step = jax.jit(self._step_impl)

    # ------------------------------------------------------------- graph
    def _graph(self, s: SmootherState, drop_only: bool = False) -> Graph:
        cfg = self.config
        W, L, C = cfg.window, self.n_landmarks, self.C
        dt = jnp.asarray(cfg.dt, self.dtype)
        qd = self._qc_dim
        qc_sqrt = jnp.eye(qd, dtype=self.dtype) / jnp.sqrt(
            jnp.asarray(cfg.qc, self.dtype)
        )
        batches = []
        # anchor on (state 0, all landmarks)
        anchor_groups = ("state",) + ("landmark",) * L
        anchor_idx = (jnp.zeros((1,), jnp.int32),) + tuple(
            jnp.full((1,), i, jnp.int32) for i in range(L)
        )
        batches.append(
            FactorBatch(
                idx=anchor_idx,
                params={
                    "sqrt_info": s.anchor_sqrt_info[None],
                    "offset": s.anchor_offset[None],
                    "mu_x": _tmap(lambda a: a[None], s.anchor_mu_x),
                    "mu_v": s.anchor_mu_v[None],
                    "mu_l": tuple(s.anchor_mu_l[i][None] for i in range(L)),
                },
                name="anchor",
                residual=self._anchor_residual,
                groups=anchor_groups,
                rdim=self.b + self.P,
            )
        )
        n_chain = 1 if drop_only else W - 1
        gp_mask = None
        ar = jnp.arange(n_chain, dtype=jnp.int32)
        batches.append(
            FactorBatch(
                idx=(ar, ar + 1),
                params={
                    "dt": jnp.full((n_chain,), dt, self.dtype),
                    "qc_sqrt_info": jnp.broadcast_to(
                        qc_sqrt, (n_chain, qd, qd)
                    ),
                },
                name="gp_prior",
                residual=self._gp_residual,
                groups=("state", "state"),
                rdim=self.b,
                mask=gp_mask,
            )
        )
        od = self._odom_dim
        if self.model == "se3":
            sig_th = cfg.odom_sigma_th or cfg.odom_sigma
            odom_sqrt = jnp.diag(jnp.asarray(
                [1.0 / sig_th] * 3 + [1.0 / cfg.odom_sigma] * 3, self.dtype,
            ))
        elif self.model == "se2":
            sig_th = cfg.odom_sigma_th or cfg.odom_sigma
            odom_sqrt = jnp.diag(jnp.asarray(
                [1.0 / cfg.odom_sigma, 1.0 / cfg.odom_sigma, 1.0 / sig_th],
                self.dtype,
            ))
        else:
            odom_sqrt = jnp.eye(od, dtype=self.dtype) / jnp.asarray(
                cfg.odom_sigma, self.dtype
            )
        if self.model == "se3":
            odom_params = {
                "z_R": s.odom_z[0][:n_chain],
                "z_t": s.odom_z[1][:n_chain],
                "sqrt_info": jnp.broadcast_to(odom_sqrt, (n_chain, od, od)),
            }
        else:
            odom_params = {
                "z": s.odom_z[:n_chain],
                "sqrt_info": jnp.broadcast_to(odom_sqrt, (n_chain, od, od)),
            }
        batches.append(
            FactorBatch(
                idx=(ar, ar + 1),
                params=odom_params,
                name="odometry",
                residual=self._odom_residual,
                groups=("state", "state"),
                rdim=od,
                mask=s.odom_mask[:n_chain],
            )
        )
        rng_mask = s.rng_mask
        if drop_only:
            rng_mask = rng_mask * (s.rng_interval == 0).astype(rng_mask.dtype)
        # clamp intervals into range so gathers stay in-bounds; mask kills
        # the contribution of out-of-window entries
        iv = jnp.clip(s.rng_interval, 0, cfg.window - 2)
        batches.append(
            FactorBatch(
                idx=(iv, iv + 1, s.rng_lm),
                params={
                    "dt": jnp.full((C,), dt, self.dtype),
                    "tau": s.rng_tau,
                    "z": s.rng_z,
                    "inv_sigma": jnp.full(
                        (C,), 1.0 / cfg.range_sigma, self.dtype
                    ),
                },
                name="interp_range",
                residual=self._range_residual,
                groups=("state", "state", "landmark"),
                rdim=1,
                mask=rng_mask,
            )
        )
        return Graph(batches=tuple(batches), manifolds=self._man)

    def _values(self, s: SmootherState):
        return {"state": (s.x, s.v), "landmark": s.landmarks}

    # ------------------------------------------------------------- init
    def init(self, x0, v0, landmarks0, prior_sigma_state=0.01,
             prior_sigma_lm=100.0, odom_z=None, ranges=None) -> SmootherState:
        """Start a window (host-side, not jitted).

        x0/v0 (W, d): initial trajectory guess.
        odom_z (W-1, d): odometry for the initial window's intervals.
        ranges: optional dict {interval (K,), tau (K,), z (K,), lm (K,)} of
        range measurements inside the initial window (interval in [0, W-2]).

        Ring-buffer layout invariant: position block k = slots [kR, (k+1)R)
        holds measurements of interval k-1, so each entry is overwritten
        exactly when its interval slides below 0.
        """
        cfg = self.config
        W, L, C = cfg.window, self.n_landmarks, self.C
        R = cfg.ranges_per_step
        dt = self.dtype
        bP = self.b + self.P
        # gauge anchor: strong on state 0 (matches the batch problem's
        # first-state prior), weak on landmarks
        info = np.diag(
            [1.0 / prior_sigma_state] * self.b + [1.0 / prior_sigma_lm] * self.P
        )

        if odom_z is None:
            if self.model == "se3":
                oz = (np.broadcast_to(np.eye(3), (W - 1, 3, 3)).copy(),
                      np.zeros((W - 1, 3)))
            else:
                oz = np.zeros((W - 1, self._odom_dim))
            om = np.zeros((W - 1,))
        else:
            oz = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), odom_z
            )
            om = np.ones((W - 1,))

        r_iv = np.full((C,), -1, np.int64)
        r_lm = np.zeros((C,), np.int64)
        r_tau = np.full((C,), 0.5 * cfg.dt)
        r_z = np.zeros((C,))
        r_m = np.zeros((C,))
        if ranges is not None:
            fill = {}
            for k in range(len(ranges["interval"])):
                iv = int(ranges["interval"][k])
                if not (0 <= iv <= W - 2):
                    continue
                blk = iv + 1
                j = fill.get(blk, 0)
                if j >= R:
                    continue  # per-interval capacity exceeded: drop
                p = blk * R + j
                fill[blk] = j + 1
                r_iv[p] = iv
                r_lm[p] = int(ranges["lm"][k])
                r_tau[p] = float(ranges["tau"][k])
                r_z[p] = float(ranges["z"][k])
                r_m[p] = 1.0

        x_tree = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), x0)
        return SmootherState(
            x=x_tree,
            v=jnp.asarray(v0, dt),
            landmarks=jnp.asarray(landmarks0, dt),
            anchor_sqrt_info=jnp.asarray(info, dt),
            anchor_offset=jnp.zeros((bP,), dt),
            anchor_mu_x=jax.tree_util.tree_map(lambda a: a[0], x_tree),
            anchor_mu_v=jnp.asarray(v0[0], dt),
            anchor_mu_l=jnp.asarray(landmarks0, dt),
            odom_z=jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), oz),
            odom_mask=jnp.asarray(om, dt),
            rng_interval=jnp.asarray(r_iv, jnp.int32),
            rng_lm=jnp.asarray(r_lm, jnp.int32),
            rng_tau=jnp.asarray(r_tau, dt),
            rng_z=jnp.asarray(r_z, dt),
            rng_mask=jnp.asarray(r_m, dt),
            step_count=jnp.zeros((), jnp.int32),
        )

    # -------------------------------------------------------- marginals
    def marginals(self, s: SmootherState):
        """Tangent-space marginal covariances of the current window states
        and landmarks (the iSAM2 covariance-query capability, computed via
        the chain selected-inverse). Host-callable (not jitted)."""
        from . import marginals as marg

        graph = self._graph(s)
        return marg.chain_marginals(graph, self._values(s))

    # ----------------------------------------------------------- settle
    def settle(self, s: SmootherState, iters: int = 10) -> SmootherState:
        """Re-solve the current window without sliding (cold-start or after
        batch-inserting measurements)."""
        if not hasattr(self, "_settle_cache"):
            self._settle_cache = {}
        if iters not in self._settle_cache:
            self._settle_cache[iters] = jax.jit(
                lambda st: self._solve_window(st, iters)[0]
            )
        return self._settle_cache[iters](s)

    def _solve_window(self, s: SmootherState, iters: int) -> SmootherState:
        from .graph import graph as graphlib
        from .ops import tridiag

        cfg = self.config
        graph = self._graph(s)
        roles = self._roles()
        L = self.n_landmarks

        def error_fn(vals):
            return graphlib.error(graph, vals)

        def step_fn(vals, lam_):
            lins = graphlib.linearize(graph, vals)
            D, U, g_s, H_sl, H_ll, g_l = chain_ops.assemble_chain(
                graph, lins, vals, roles, "state", "landmark"
            )
            ds, dl = tridiag.schur_arrowhead_solve(
                D, U, g_s, H_sl, H_ll, g_l, lam_, False
            )
            return {"state": ds, "landmark": dl.reshape(L, self.d)}

        def retract_fn(vals, delta):
            return graphlib.retract_all(graph, vals, delta)

        iters_max = max(iters, cfg.iters_max_per_step)
        cfg_lm = LMConfig(
            max_iterations=iters_max, lambda_init=cfg.lambda_fixed,
            relative_error_tol=(cfg.relinearize_tol
                                if iters_max > iters else
                                LMConfig.relative_error_tol),
        )
        vals, stats = _lm_loop(
            self._values(s), error_fn, step_fn, retract_fn, cfg_lm, self.dtype
        )
        return s.replace(x=vals["state"][0], v=vals["state"][1],
                         landmarks=vals["landmark"]), stats

    # ------------------------------------------------------------- step
    def step(self, s: SmootherState, odom_z, rng_tau, rng_z, rng_lm,
             rng_valid) -> Tuple[SmootherState, Dict[str, Any]]:
        """Advance one interval: slide + insert measurements + re-solve.

        odom_z (d,): relative-position odometry for the new interval.
        rng_* (ranges_per_step,): new range measurements at tau in the NEW
        newest interval; rng_valid is a 0/1 mask for unused slots.
        """
        return self._step(
            s,
            jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, self.dtype), odom_z
            ),
            jnp.asarray(rng_tau, self.dtype),
            jnp.asarray(rng_z, self.dtype),
            jnp.asarray(rng_lm, jnp.int32),
            jnp.asarray(rng_valid, self.dtype),
        )

    def run_steps(self, s: SmootherState, odom_seq, rng_tau_seq, rng_z_seq,
                  rng_lm_seq, rng_valid_seq):
        """Advance K buffered steps in ONE device dispatch — a `lax.scan`
        over the per-step marginalize/roll/solve, killing the per-step host
        round-trip (the reference's iSAM2 never leaves the process either;
        SURVEY.md §3.2. Measured r1: 39.4 ms/step of which ~22 ms was tunnel
        RTT — amortized over K the RTT vanishes).

        odom_seq: (K, d) (or pytree of (K, ...) for se3);
        rng_*_seq: (K, ranges_per_step). Returns (state, outs) with outs =
        dict of stacked per-step results: head_x (K, d), head_v (K, d),
        chi2 (K,). One compile per distinct K (use a fixed chunk size).
        """
        if not hasattr(self, "_run_cache"):
            self._run_cache = jax.jit(self._scan_steps)
        return self._run_cache(
            s,
            jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, self.dtype), odom_seq
            ),
            jnp.asarray(rng_tau_seq, self.dtype),
            jnp.asarray(rng_z_seq, self.dtype),
            jnp.asarray(rng_lm_seq, jnp.int32),
            jnp.asarray(rng_valid_seq, self.dtype),
        )

    def _scan_steps(self, s, odom_seq, tau_seq, z_seq, lm_seq, valid_seq):
        def body(st, inp):
            odo, tau, z, lm, val = inp
            st2, out = self._step_impl(st, odo, tau, z, lm, val)
            return st2, (out["head_x"], out["head_v"], out["chi2"])

        s, (hx, hv, chi2) = jax.lax.scan(
            body, s, (odom_seq, tau_seq, z_seq, lm_seq, valid_seq)
        )
        return s, {"head_x": hx, "head_v": hv, "chi2": chi2}

    def _cast_seqs(self, odom_seq, tau_seq, z_seq, lm_seq, valid_seq):
        return (
            jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, self.dtype), odom_seq
            ),
            jnp.asarray(tau_seq, self.dtype),
            jnp.asarray(z_seq, self.dtype),
            jnp.asarray(lm_seq, jnp.int32),
            jnp.asarray(valid_seq, self.dtype),
        )

    def run_steps_multiseed(self, s, odom_seq, rng_tau_seq, rng_z_seq,
                            rng_lm_seq, rng_valid_seq):
        """Many-hypothesis config-5 composition (SURVEY.md §2.4 P6 x S11):
        S independent smoother states advance K buffered steps each in ONE
        dispatch — `jax.vmap` over the K-step scan. Every argument carries a
        leading seed axis S (tile the measurement sequences to share them).
        Returns (state_batch, outs) with outs values shaped (S, K, ...)."""
        if not hasattr(self, "_run_ms_cache"):
            self._run_ms_cache = jax.jit(jax.vmap(self._scan_steps))
        return self._run_ms_cache(
            s, *self._cast_seqs(odom_seq, rng_tau_seq, rng_z_seq,
                                rng_lm_seq, rng_valid_seq)
        )

    def run_steps_sharded(self, s, odom_seq, rng_tau_seq, rng_z_seq,
                          rng_lm_seq, rng_valid_seq, mesh,
                          axis_name: str = "seed"):
        """Multi-chip config-5: the hypothesis axis SHARDED over the device
        mesh — each chip scans its seed shard with ZERO per-step
        communication (hypotheses are independent; this is the idiomatic
        sharding for many-seed smoothing — window solves are latency-bound
        at W ~ 100, so splitting WITHIN a window would trade no-comm
        parallelism for per-level collectives). Arbitrary seed counts: the
        leading axis S is padded to a mesh multiple with copies of the last
        seed (padded lanes compute and are dropped — the same padding idiom
        as time_shard/pad_graph) and outputs are sliced back to S. Scales to
        multi-host by widening the mesh (the same shard_map runs under
        jax.distributed)."""
        import functools

        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import global_put

        n_dev = mesh.devices.size
        S = jax.tree_util.tree_leaves(s)[0].shape[0]
        seqs = self._cast_seqs(odom_seq, rng_tau_seq, rng_z_seq,
                               rng_lm_seq, rng_valid_seq)
        S_pad = ((S + n_dev - 1) // n_dev) * n_dev
        if S_pad != S:
            def padf(a):
                return jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (S_pad - S,) + a.shape[1:])],
                    0,
                )
            s = jax.tree_util.tree_map(padf, s)
            seqs = jax.tree_util.tree_map(padf, seqs)
        spec_of = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda _: P(axis_name), t)
        s = global_put(s, mesh, spec_of(s))
        seqs = global_put(seqs, mesh, spec_of(seqs))
        out_struct = jax.eval_shape(jax.vmap(self._scan_steps), s, *seqs)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_of(s), *[spec_of(q) for q in seqs]),
            out_specs=jax.tree_util.tree_map(lambda _: P(axis_name),
                                             out_struct),
            check_vma=False,
        )
        def run(s_loc, *seqs_loc):
            return jax.vmap(self._scan_steps)(s_loc, *seqs_loc)

        out = jax.jit(run)(s, *seqs)
        if S_pad != S:
            out = jax.tree_util.tree_map(lambda a: a[:S], out)
        return out

    def _step_impl(self, s, odom_z, rng_tau, rng_z, rng_lm, rng_valid):
        cfg = self.config
        W, L = cfg.window, self.n_landmarks
        b, P = self.b, self.P
        dt = self.dtype

        # ---- 1. marginalize the departing state onto (state 1, landmarks)
        drop_graph = self._graph(s, drop_only=True)
        values = self._values(s)
        from .graph import graph as graphlib

        lins = graphlib.linearize(drop_graph, values)
        layout, Dtot = dense_ops.tangent_layout(drop_graph, values)
        H, g = dense_ops.assemble_dense(drop_graph, lins, layout, Dtot, dt)
        lm_off = layout["landmark"][0]
        # rows: [state0 | state1 | landmarks]
        i0 = jnp.arange(b)
        i1 = jnp.arange(b, 2 * b)
        il = lm_off + jnp.arange(P)
        ir = jnp.concatenate([i1, il])
        H00 = H[jnp.ix_(i0, i0)]
        H0r = H[jnp.ix_(i0, ir)]
        Hrr = H[jnp.ix_(ir, ir)]
        g0 = g[i0]
        gr = g[ir]
        L00 = sb.cholesky(H00 + 1e-8 * jnp.eye(b, dtype=dt))
        X = sb.chol_solve(L00, H0r)  # H00^{ -1} H0r
        Lam = Hrr - H0r.T @ X
        gnew = gr - X.T @ g0
        Lc = jnp.linalg.cholesky(Lam + 1e-8 * jnp.eye(b + P, dtype=dt))
        sqrt_info = Lc.T  # A with A^T A = Lam
        offset = jax.scipy.linalg.solve_triangular(Lc, gnew, lower=True)

        # ---- 2. roll the window
        x_last = _tmap(lambda a: a[-1], s.x)
        x_pred = self._predict(x_last, s.v[-1], cfg.dt)
        x = _tmap(
            lambda a, p: jnp.concatenate([a[1:], p[None]], 0), s.x, x_pred
        )
        v = jnp.concatenate([s.v[1:], s.v[-1][None]], 0)
        odom_z_new = _tmap(
            lambda a, z: jnp.concatenate([a[1:], z[None]], 0), s.odom_z, odom_z
        )
        odom_mask = jnp.concatenate(
            [s.odom_mask[1:], jnp.ones((1,), dt)], 0
        )
        R = cfg.ranges_per_step
        rng_interval = jnp.concatenate(
            [s.rng_interval[R:] - 1, jnp.full((R,), W - 2, jnp.int32)], 0
        )
        rng_lm_all = jnp.concatenate([s.rng_lm[R:], rng_lm], 0)
        rng_tau_all = jnp.concatenate([s.rng_tau[R:], rng_tau], 0)
        rng_z_all = jnp.concatenate([s.rng_z[R:], rng_z], 0)
        rng_mask = jnp.concatenate(
            [s.rng_mask[R:] * (rng_interval[:-R] >= 0).astype(dt), rng_valid], 0
        )

        s2 = s.replace(
            x=x, v=v,
            anchor_sqrt_info=sqrt_info,
            anchor_offset=offset,
            anchor_mu_x=_tmap(lambda a: a[1], s.x),
            anchor_mu_v=s.v[1],
            anchor_mu_l=s.landmarks,
            odom_z=odom_z_new, odom_mask=odom_mask,
            rng_interval=rng_interval, rng_lm=rng_lm_all,
            rng_tau=rng_tau_all, rng_z=rng_z_all, rng_mask=rng_mask,
            step_count=s.step_count + 1,
        )

        # ---- 3. warm-started damped iterations on the window
        s3, stats = self._solve_window(s2, cfg.iters_per_step)
        out = {
            "x": s3.x, "v": s3.v, "landmarks": s3.landmarks,
            "head_x": _tmap(lambda a: a[-1], s3.x), "head_v": s3.v[-1],
            "chi2": stats.error,
        }
        return s3, out

    def _roles(self):
        if not hasattr(self, "_roles_cache"):
            dummy = self.init(
                np.zeros((self.config.window, self.d)),
                np.zeros((self.config.window, self.d)),
                np.zeros((self.n_landmarks, self.d)),
            )
            g = self._graph(dummy)
            self._roles_cache = chain_ops.build_role_table(
                g, "state", "landmark"
            )
        return self._roles_cache
