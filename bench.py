"""Headline benchmark: full-batch LM solve wall-clock (BASELINE.json §2).

Reports ONE JSON line:
  metric       lm_wallclock_100k_states — the chip-decisive scale row
               (VERDICT r3 item 7): a 100k-state / 234k-factor WNOA
               range-SLAM full LM on the device vs the f64 scipy
               sparse-direct (SuperLU) CPU reference running the SAME
               problem to the SAME chi^2 with the same GTSAM-default LM
               schedule (bench/cpu_reference.py documents the methodology —
               the closest GTSAM stand-in in this zero-egress environment).
               The former headline, the Plaza1-scale 9.7k-state solve, sits
               on the ~22 ms tunnel dispatch-RTT floor, so its ratio
               measures latency, not the chip; it is retained in
               extra.plaza1_9700 for cross-round continuity (same
               methodology, all denominators intact).
  value        steady-state wall-clock seconds of the full LM solve on the
               default (TPU) backend
  unit         s
  vs_baseline  CPU-reference wall / device wall

Extras: the Plaza1-scale continuity row (with its SuperLU + same-code
JAX-CPU denominators), RTT-amortized multiseed throughput with genuinely
perturbed seeds, the calibrated chip context (22 ms dispatch RTT floor,
242 GB/s HBM, 24 TF f32 — BASELINE.md), and the other scale rows:

  scale_100k    the headline row's full detail (both CPU denominators).
  scale_lc_10k  10k-state SE(2) LOOP-CLOSURE graph (general-sparse path):
                supernodal LM in pallas_stream (gather-GEMM kernels over
                the chunked instruction stream) AND stream modes,
                factorization GFLOP/s, pallas-vs-stream ratio, chi^2
                parity, vs the SuperLU loop-closure reference.
  scale_1m_bcr  1M-state block-tridiagonal solve (BASELINE config-5 scale,
                single chip): fused plane-major Pallas BCR vs the XLA path
                vs the host CPU, with achieved bandwidth vs the 242 GB/s
                roofline (itemized traffic model).
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the vmapped multiseed program compiles in ~2 min
# cold on the tunnel-attached backend; cached it loads in seconds, which
# keeps the whole bench well inside the driver's budget
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_problem(n_states=9700, dtype=jnp.float32):
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import linear2d

    data = synthetic.make_linear2d_range_slam(
        n_states=n_states, ranges_per_interval=0.36, seed=0
    )
    graph, values = linear2d.build(data, dtype=dtype)
    return graph, values, data


def make_solver(graph):
    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.ops import chain
    from gpslam_tpu.solve import lm_solve

    # fused Pallas BCR levels on TPU (falls through to XLA on CPU/small N)
    use_pallas = jax.default_backend() == "tpu"
    solver = chain.make_chain_solver(graph, use_pallas=use_pallas)
    cfg = LMConfig(max_iterations=40)
    return jax.jit(lambda g, v: lm_solve(g, v, cfg, solver=solver))


def time_solve(solve, graph, values, repeats=3):
    vals, stats = solve(graph, values)
    float(stats.error)  # compile + first run; host fetch forces completion
    # (block_until_ready is unreliable through the axon tunnel)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        vals, stats = solve(graph, values)
        float(stats.error)
        best = min(best, time.perf_counter() - t0)
    return best, stats


def count_factors(graph):
    return int(sum(b.size for b in graph.batches))


def _run_subprocess_json(script, n_states, timeout_s):
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(here, "bench", script),
             str(n_states)],
            capture_output=True, text=True, timeout=timeout_s, cwd=here,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def run_cpu_reference(n_states, timeout_s=480):
    """f64 scipy sparse-direct LM denominator, in a subprocess (needs a
    fresh interpreter: x64 + CPU platform must be set before tracing).
    Returns the info dict, or None if unavailable."""
    return _run_subprocess_json("run_cpu_reference.py", n_states, timeout_s)


def run_jax_cpu(n_states, timeout_s=480):
    """Same-code JAX-CPU LM in a subprocess (bench/run_jax_cpu.py): avoids
    both the sitecustomize platform pin and tunnel round-trips for the
    problem arrays."""
    return _run_subprocess_json("run_jax_cpu.py", n_states, timeout_s)


def bench_scale_100k():
    """100k-state full LM on the default backend + both CPU denominators.
    Returns the extras dict (None on any failure — never sinks the bench)."""
    graph, values, _ = build_problem(n_states=100_000)
    solve = make_solver(graph)
    t_dev, stats = time_solve(solve, graph, values)

    cpu_ref = run_cpu_reference(100_000)
    jax_cpu = run_jax_cpu(100_000)
    row = {
        "n_states": 100_000,
        "n_factors": count_factors(graph),
        "tpu_lm_s": round(t_dev, 4),
        "iterations": int(stats.iterations),
        "chi2_final": float(stats.error),
        "converged": bool(stats.converged),
    }
    if cpu_ref:
        row["cpu_superlu_s"] = round(cpu_ref["wall_s"], 3)
        row["vs_baseline"] = round(cpu_ref["wall_s"] / t_dev, 2)
        row["cpu_superlu_chi2"] = cpu_ref["chi2"]
    if jax_cpu:
        row["jax_cpu_s"] = round(jax_cpu["wall_s"], 4)
        row["vs_jax_cpu"] = round(jax_cpu["wall_s"] / t_dev, 2)
    return row


def bench_scale_lc(n_states=10_000, compare_stream=True,
                   with_marginals=False):
    """General-sparse (loop-closure) path on device — VERDICT r4 items
    1/2/4/5.

    A >=10k-state SE(2) pose graph with loop closures CANNOT use the chain
    solver; it exercises the supernodal path. Times the SHIPPED
    configuration — the exact solver object auto_supernodal constructs
    (mode="mega" on TPU/f32: the single-launch manual-DMA factorization +
    solve kernels; asserted equal to the auto_solver dispatch string) —
    against the XLA "stream" fallback on the same graph and the f64
    SuperLU CPU reference (bench/run_cpu_reference_lc.py). Reports the
    full-LM wall, a per-stage split (linearize / assemble / factorize /
    solve, fori-amortized so the ~22 ms dispatch RTT cancels), compile
    seconds, and chi^2 parity between modes. with_marginals adds a
    selected-inverse-at-scale timing (ALL per-variable covariances off the
    shipped factor — SURVEY §2.2 S12 at scale).
    """
    import io
    from contextlib import redirect_stdout

    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import pose2_slam
    from gpslam_tpu.ops.amalgamated import AmalgamatedSupernodalSolver
    from gpslam_tpu.solve import lm_solve
    from gpslam_tpu.solve.auto import auto_solver, auto_supernodal

    data = synthetic.make_se2_pose_graph(n_states=n_states, seed=4)
    graph, values = pose2_slam.build(data, dtype=jnp.float32)
    row = {"n_states": n_states,
           "n_factors": count_factors(graph),
           "n_loop_closures": int(data["lc_i"].shape[0])}

    buf = io.StringIO()
    with redirect_stdout(buf):
        auto_solver(graph, values, verbose=True)
    row["auto_dispatch"] = buf.getvalue().strip()

    # the timed solver IS the dispatched configuration (r4 weak 3): the
    # same constructor auto_solver uses, asserted against its own verbose
    # dispatch line
    sn_auto = auto_supernodal(graph, values)
    row["benched_config"] = {
        "mode": sn_auto._mode, "w_max": sn_auto.w_max,
        "dense_tail": sn_auto.n_tail, "b_panel": sn_auto.b,
        "levels": len(sn_auto.levels),
    }
    row["benched_equals_dispatched"] = (
        f"mode={sn_auto._mode}" in row["auto_dispatch"]
        and f"dense_tail={sn_auto.n_tail} panels" in row["auto_dispatch"]
    )

    cfg = LMConfig(max_iterations=30)
    lins = graphlib.linearize(graph, values)
    solvers = {f"auto_{sn_auto._mode}": sn_auto}
    if compare_stream and sn_auto._mode != "stream":
        solvers["stream"] = AmalgamatedSupernodalSolver(
            graph, values, ordering="nd", w_max=sn_auto.w_max,
            mode="stream", dense_tail=sn_auto.n_tail,
        )

    def amortized(f, args, reps=8):
        @jax.jit
        def loop(args):
            def body(i, acc):
                out = f(*args)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + jnp.asarray(leaf).reshape(-1)[0] * 1e-20
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))
        t0 = time.perf_counter()
        float(loop(args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(args))
            best = min(best, time.perf_counter() - t0)
        return best / reps, compile_s

    # mode-INDEPENDENT stages, measured once (linearize/assemble don't
    # consult the schedule mode)
    lam = jnp.float32(1e-2)
    t_lin, _ = amortized(lambda g, v: graphlib.linearize(g, v),
                         (graph, values), reps=4)
    t_asm, _ = amortized(
        lambda g, l, v: sn_auto.assemble(g, l, v, lam),
        (graph, lins, values), reps=4)
    row["stage_ms_amortized_common"] = {
        "linearize": round(t_lin * 1e3, 3),
        "assemble": round(t_asm * 1e3, 3),
    }
    blocks, g_vec = sn_auto.assemble(graph, lins, values, lam)
    blocks, g_vec = jax.device_put((blocks, g_vec))

    chi2 = {}
    for tag, sn in solvers.items():
        f = jax.jit(lambda g, v, s=sn.solver: lm_solve(g, v, cfg, solver=s))
        t0 = time.perf_counter()
        vals, st = f(graph, values)
        float(st.error)
        lm_compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            vals, st = f(graph, values)
            float(st.error)
            best = min(best, time.perf_counter() - t0)
        chi2[tag] = float(st.error)
        row[tag] = {
            "lm_wall_s": round(best, 4),
            "iterations": int(st.iterations),
            "chi2_final": chi2[tag],
            "converged": bool(st.converged),
            "compile_s": {"lm": round(lm_compile_s, 1)},
        }
        if sn is sn_auto:
            # factorize/solve stage splits only for the SHIPPED config
            # (amortizing them for the stream twin costs ~8 min of compile
            # for a known-slower path; its LM wall + parity suffice)
            t_fact, fact_compile_s = amortized(sn.factorize, (blocks,))
            B = sn.b
            n_upd = sum(len(u[0]) for u in sn.upd_sched)
            n_trsm = sum(len(c[1]) for c in sn.col_sched)
            n_chol = sum(len(c[0]) for c in sn.col_sched)
            flops = (2 * n_upd * B**3 + n_trsm * B**3 + n_chol * B**3 / 3
                     + (sn.n_tail * B) ** 3 / 3)
            L = jax.jit(sn.factorize)(blocks)
            t_solve, solve_compile_s = amortized(
                lambda L_, g_: sn.solve_factored(L_, g_), (L, -g_vec))
            row[tag].update({
                "factorize_ms_amortized": round(t_fact * 1e3, 3),
                "factorize_gflops": round(flops / t_fact / 1e9, 1),
                "solve_ms_amortized": round(t_solve * 1e3, 3),
            })
            row[tag]["compile_s"]["factorize"] = round(fact_compile_s, 1)
            row[tag]["compile_s"]["solve"] = round(solve_compile_s, 1)
    tags = list(solvers)
    if len(tags) == 2:
        a, b = tags
        row["auto_vs_stream_lm"] = round(
            row[b]["lm_wall_s"] / row[a]["lm_wall_s"], 2)
        # §5.2 sanitizer: the compiled mega kernels must agree with the
        # stream path on the full nonlinear solve
        rel = abs(chi2[a] - chi2[b]) / max(abs(chi2[b]), 1.0)
        row["chi2_rel_diff_auto_vs_stream"] = float(f"{rel:.2e}")
        row["parity_ok"] = bool(rel < 1e-3)
    if with_marginals:
        # selected inverse at scale: every per-variable covariance off the
        # shipped factor (S12 perf row beyond the 600-state microbench) —
        # O(1)-in-levels compile on the mega path (selected_inverse_mega).
        # Own try/except: a marginals failure must not sink the LM row.
        try:
            def marg(blocks):
                S = sn_auto.selected_inverse(sn_auto.factorize(blocks))
                return sn_auto.diag_marginals(S, graph)

            blocks, _ = sn_auto.assemble(graph, lins, values,
                                         jnp.float32(1e-2))
            t_marg, marg_compile_s = amortized(
                marg, (jax.device_put(blocks),), reps=2)
            row["selected_inverse_all_marginals_ms"] = round(t_marg * 1e3, 2)
            row["selected_inverse_compile_s"] = round(marg_compile_s, 1)
        except Exception as e:  # pragma: no cover
            row["selected_inverse_all_marginals_ms"] = f"failed: {e!r}"
    cpu_ref = _run_subprocess_json("run_cpu_reference_lc.py", n_states, 900)
    if cpu_ref:
        row["cpu_superlu_s"] = round(cpu_ref["wall_s"], 3)
        row["cpu_superlu_chi2"] = cpu_ref["chi2"]
        dev = row.get(tags[0])
        if dev:
            row["vs_baseline"] = round(cpu_ref["wall_s"] / dev["lm_wall_s"], 2)
    return row


def bench_bcr_1m(b=4, k=1):
    """1M-state block-tridiag solve: fused Pallas vs XLA vs host CPU."""
    from gpslam_tpu.ops import pallas_bcr, tridiag

    n = 1 << 20
    rng = np.random.default_rng(0)
    D = rng.normal(size=(n, b, b))
    D = D @ D.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    U = 0.5 * rng.normal(size=(n, b, b))
    U[-1] = 0
    r = rng.normal(size=(n, b, k))
    D_np = D.astype(np.float32)
    U_np = U.astype(np.float32)
    r_np = r.astype(np.float32)
    D, U, r = (jnp.asarray(x) for x in (D_np, U_np, r_np))

    def timed(f, args, reps=3):
        g = jax.jit(f)
        float(g(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_fused = timed(lambda D, U, r: jnp.sum(
        pallas_bcr.bcr_solve_fused(D, U, r)), (D, U, r))
    t_xla = timed(lambda D, U, r: jnp.sum(
        tridiag.bcr_solve(D, U, r)), (D, U, r))
    # traffic model (itemized from pallas_bcr.py, per level of size s with
    # set(s) = s*(2*b*b + b*k)*4 bytes — the D,U,r arrays at that size):
    #   deinterleave R+W set(s); reduce kernel R set(s), W ~0.72 set(s)
    #   (L + reduced D,U,r at s/2); backsub R ~0.78 set(s), W x_odd;
    #   interleave R+W of x. Summed with b=4,k=1 weights ~4.8 set(s) per
    #   level; level sizes halve, so total ~9.5x the level-0 set. Bandwidth
    #   is reported against the DEVICE-time estimate (wall minus the ~22 ms
    #   dispatch+fetch RTT) — NOTE that subtraction leaves a ~5 ms estimate
    #   from a ~27 ms wall measurement, so the roofline figure is noise-
    #   dominated (+-30%); it locates the kernel at roughly the 242 GB/s
    #   bound, which is the point. (The round-3 report used a 3x multiplier
    #   that ignored the de/interleave round-trips and backsub reads — that,
    #   not kernel headroom, was the "41% of roofline" anomaly.)
    set0_bytes = 4 * n * (2 * b * b + b * k)
    # RTT sanitization (VERDICT r4 weak 4): the wall includes a dispatch+
    # fetch RTT measured between ~15 and ~30 ms run-to-run; subtracting a
    # point estimate from a ~27 ms wall yields a noise-dominated device
    # time, so report a RANGE and clamp the implied bandwidth at the
    # physical 242 GB/s roofline instead of printing impossible numbers.
    t_dev_lo = max(t_fused - 0.030, 1e-4)
    t_dev_hi = max(t_fused - 0.015, 1e-4)
    gbps = lambda t: 9.5 * set0_bytes / t / 1e9  # noqa: E731
    row = {
        "n_states": n, "block_dim": b,
        "fused_pallas_s": round(t_fused, 4),
        "xla_s": round(t_xla, 4),
        "fused_vs_xla": round(t_xla / t_fused, 2),
        "device_time_est_range_s": [round(t_dev_lo, 4), round(t_dev_hi, 4)],
        "effective_gbps_range_vs_242_roofline": [
            round(min(gbps(t_dev_hi), 242.0), 1),
            round(min(gbps(t_dev_lo), 242.0), 1),
        ],
        "roofline_note": "device time = wall minus a 15-30 ms RTT band; "
                         "values clamped at the 242 GB/s HBM roofline",
    }
    if jax.default_backend() != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                Dc, Uc, rc = (jnp.asarray(x) for x in (D_np, U_np, r_np))
                t_cpu = timed(lambda D, U, r: jnp.sum(
                    tridiag.bcr_solve(D, U, r)), (Dc, Uc, rc), reps=2)
            row["jax_cpu_s"] = round(t_cpu, 4)
            row["vs_jax_cpu"] = round(t_cpu / t_fused, 2)
        except Exception:
            pass
    return row


def main():
    graph, values, data = build_problem()
    n_factors = count_factors(graph)

    # default backend (TPU under the driver; CPU locally)
    solve = make_solver(graph)
    t_dev, stats = time_solve(solve, graph, values)
    backend = jax.devices()[0].platform

    # CPU reference denominator: f64 scipy SuperLU LM, same problem, same
    # LM schedule, in a subprocess (bench/cpu_reference.py methodology)
    cpu_ref = run_cpu_reference(9700)

    # secondary denominator: the same JAX solve on this host's CPU backend
    # (round-1 continuity; our own optimized code, so a HARDER baseline
    # than a factor-at-a-time C++ library)
    if backend != "cpu":
        cpu = jax.devices("cpu")[0]
        graph_c, values_c = jax.device_put((graph, values), cpu)
        with jax.default_device(cpu):
            solve_c = make_solver(graph_c)
            t_cpu, _ = time_solve(solve_c, graph_c, values_c, repeats=1)
    else:
        t_cpu = t_dev

    # RTT-amortized throughput: S independent full solves vmapped (the
    # BASELINE "vmapped chain dimension"); per-solve time is the honest
    # chip-throughput number when host latency dominates single solves
    from gpslam_tpu.parallel import lm_solve_multiseed
    from gpslam_tpu.config import LMConfig
    from gpslam_tpu.ops import chain as chain_ops

    S = 8
    leaves, treedef = jax.tree_util.tree_flatten(values)
    rng = np.random.default_rng(42)
    # genuinely distinct hypotheses: perturb each seed's initialization
    # (BASELINE "many-seed / many-hypothesis" — not a broadcast throughput toy)
    values_b = jax.tree_util.tree_unflatten(
        treedef,
        [
            jnp.asarray(
                np.asarray(l)[None]
                + 0.1 * rng.standard_normal((S, *l.shape)),
                l.dtype,
            )
            for l in leaves
        ],
    )
    solver_ms = chain_ops.make_chain_solver(graph)
    cfg_ms = LMConfig(max_iterations=40)
    f_ms = jax.jit(
        lambda v: lm_solve_multiseed(graph, v, cfg_ms, solver=solver_ms)[1].error
    )
    float(f_ms(values_b).sum())
    t_ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(f_ms(values_b).sum())
        t_ms = min(t_ms, time.perf_counter() - t0)

    # scale rows (round-2 verdict item 1; round-3 item 1b adds the
    # loop-closure/general-sparse row; round-4 item 4 the 50k row +
    # selected-inverse-at-scale): never let them sink the headline
    try:
        scale_100k = bench_scale_100k()
    except Exception as e:  # pragma: no cover
        scale_100k = f"failed: {e!r}"
    try:
        # with_marginals=True is affordable since the single-launch
        # blocked-Takahashi kernel (selected_inverse_mega) replaced the
        # unrolled XLA program on the mega path: compile is O(1) in level
        # count (~20 s vs 1669 s measured for the XLA Takahashi at 10k,
        # 2026-08-22, v5e) — the S12 at-scale figure is now a live row
        scale_lc = bench_scale_lc(10_000, with_marginals=True)
    except Exception as e:  # pragma: no cover
        scale_lc = f"failed: {e!r}"
    try:
        # 50k: where per-step work outgrows dispatch cost (r4 item 4);
        # auto mode only — the stream comparison at this scale costs
        # minutes of bench budget for a known-slower path. Marginals at
        # 50k ride the O(1)-compile mega selected inverse (round 5).
        scale_lc_50k = bench_scale_lc(50_000, compare_stream=False,
                                      with_marginals=True)
    except Exception as e:  # pragma: no cover
        scale_lc_50k = f"failed: {e!r}"
    try:
        scale_1m = bench_bcr_1m()
    except Exception as e:  # pragma: no cover
        scale_1m = f"failed: {e!r}"
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench"))
        import config5_scale

        scale_c5 = config5_scale.run(n_steps=100_000)
    except Exception as e:  # pragma: no cover
        scale_c5 = f"failed: {e!r}"

    iters = int(stats.iterations)
    # wall-derived evals/s (includes the ~22 ms RTT floor) — RENAMED from
    # factor_evals_per_s (r4 weak 5: same key, different methodology read
    # as a cross-round regression); the fori-amortized microbench below
    # carries the r1 semantics under the original key
    evals_per_s_wall = n_factors * max(iters, 1) * 2 / t_dev
    try:
        from gpslam_tpu.graph import graph as graphlib

        lins0 = graphlib.linearize(graph, values)
        probe = jax.tree_util.tree_leaves(lins0)[0]

        @jax.jit
        def lin_loop(graph, values, reps=16):
            def body(i, acc):
                lins = graphlib.linearize(graph, values)
                leaf = jax.tree_util.tree_leaves(lins)[0]
                return acc + leaf.reshape(-1)[0] * 1e-20
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), probe.dtype))

        float(lin_loop(graph, values))
        t_lin = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(lin_loop(graph, values))
            t_lin = min(t_lin, time.perf_counter() - t0)
        evals_per_s_amortized = n_factors * 16 / t_lin
    except Exception:  # pragma: no cover
        evals_per_s_amortized = None
    t_ref = cpu_ref["wall_s"] if cpu_ref else t_cpu
    plaza1_row = {
        "n_states": 9700,
        "n_factors": n_factors,
        "tpu_lm_s": round(t_dev, 4),
        "vs_baseline": round(t_ref / t_dev, 3),
        "iterations": iters,
        "chi2_init": float(stats.error0),
        "chi2_final": float(stats.error),
        "converged": bool(stats.converged),
        "cpu_reference": (
            {
                "kind": "f64 scipy SuperLU sparse-direct LM, same problem"
                        " + LM schedule (bench/cpu_reference.py)",
                "wall_s": round(cpu_ref["wall_s"], 4),
                "chi2_final": cpu_ref["chi2"],
                "iterations": cpu_ref["iterations"],
            }
            if cpu_ref else "unavailable (fell back to jax-cpu)"
        ),
        "jax_cpu_same_code_s": round(t_cpu, 4),
        "vs_jax_cpu": round(t_cpu / t_dev, 3),
        # wall minus a 15-30 ms RTT band (see scale_1m_bcr note): row-to-row
        # drift of the WALL number at this scale is RTT noise, not device
        # regression (r3 41.2 ms -> r4 46.8 ms was exactly this)
        "device_time_est_range_ms": [
            round(max(t_dev * 1e3 - 30.0, 0.0), 1),
            round(max(t_dev * 1e3 - 15.0, 0.0), 1),
        ],
        "factor_evals_per_s_wall": int(evals_per_s_wall),
        "factor_evals_per_s": (int(evals_per_s_amortized)
                               if evals_per_s_amortized else None),
    }

    # headline (VERDICT r3 item 7): the chip-decisive 100k-state row — the
    # 9.7k Plaza1-scale solve sits on the ~22 ms tunnel-RTT floor, so its
    # ratio reflects dispatch latency, not the chip. Same metric semantics
    # (full-batch LM wall-clock vs the f64 SuperLU CPU reference, identical
    # problem + LM schedule); the Plaza1-scale row rides in extra for
    # cross-round continuity.
    if isinstance(scale_100k, dict) and "vs_baseline" in scale_100k:
        metric = "lm_wallclock_100k_states"
        value = scale_100k["tpu_lm_s"]
        vs_baseline = scale_100k["vs_baseline"]
    else:  # fall back to the continuity row if the scale bench failed
        metric = "plaza1_scale_lm_wallclock"
        value = round(t_dev, 4)
        vs_baseline = round(t_ref / t_dev, 3)
    result = {
        "metric": metric,
        "value": value,
        "unit": "s",
        "vs_baseline": vs_baseline,
        "extra": {
            "backend": backend,
            "plaza1_9700": plaza1_row,
            "chip_context": {"dispatch_rtt_ms": 22, "hbm_gbps": 242,
                             "f32_tflops": 24},
            "multiseed_solves": S,
            "multiseed_total_s": round(t_ms, 4),
            "per_solve_ms_amortized": round(1e3 * t_ms / S, 2),
            "scale_100k": scale_100k,
            "scale_lc_10k": scale_lc,
            "scale_lc_50k": scale_lc_50k,
            "scale_1m_bcr": scale_1m,
            "scale_config5_100k_steps": scale_c5,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
