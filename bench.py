"""Headline benchmark: Plaza1-scale full-batch LM solve (BASELINE.json §2).

Problem: synthetic range-only SLAM at Plaza1 scale — 9700 chain states
(position+velocity, WNOA GP prior), ~3.5k GP-interpolated range measurements
to 4 beacons, 9699 odometry factors (the real Plaza1 dataset is unreachable:
zero-egress environment; see BASELINE.md). Solver: BCR+Schur chain backend,
full LM to convergence, f32.

Reports ONE JSON line:
  metric       plaza1_scale_lm_wallclock
  value        steady-state wall-clock seconds of the full LM solve on the
               default (TPU) backend
  unit         s
  vs_baseline  speedup vs the CPU reference denominator: an f64 scipy
               sparse-direct (SuperLU) LM on this host running the SAME
               problem to the SAME chi^2 with the same GTSAM-default LM
               schedule (bench/cpu_reference.py documents the methodology —
               the closest GTSAM stand-in available in this zero-egress
               environment; BASELINE.md records the target >=10x vs C++ CPU).
               The denominator runs in a subprocess on the JAX CPU backend
               with x64 enabled.

Extras include the same solve on this host's JAX-CPU backend (the round-1
denominator, kept for continuity), RTT-amortized multiseed throughput with
genuinely perturbed seeds, and the calibrated chip context (22 ms dispatch
RTT floor, 242 GB/s HBM, 24 TF f32 — BASELINE.md).
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


def run_cpu_reference(n_states, timeout_s=480):
    """f64 scipy sparse-direct LM denominator, in a subprocess (needs a
    fresh interpreter: x64 + CPU platform must be set before tracing).
    Returns the info dict, or None if unavailable."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(here, "bench", "run_cpu_reference.py"),
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

    iters = int(stats.iterations)
    evals_per_s = n_factors * max(iters, 1) * 2 / t_dev  # 2 linearize+error passes
    t_ref = cpu_ref["wall_s"] if cpu_ref else t_cpu
    result = {
        "metric": "plaza1_scale_lm_wallclock",
        "value": round(t_dev, 4),
        "unit": "s",
        "vs_baseline": round(t_ref / t_dev, 3),
        "extra": {
            "backend": backend,
            "n_states": 9700,
            "n_factors": n_factors,
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
            "chip_context": {"dispatch_rtt_ms": 22, "hbm_gbps": 242,
                             "f32_tflops": 24},
            "device_time_est_ms": round(max(t_dev * 1e3 - 22.0, 0.0), 1),
            "factor_evals_per_s": int(evals_per_s),
            "multiseed_solves": S,
            "multiseed_total_s": round(t_ms, 4),
            "per_solve_ms_amortized": round(1e3 * t_ms / S, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
