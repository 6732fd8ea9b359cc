"""Config-5 at scale (VERDICT r3 item 4): >=100k sliding-window smoother
steps driven in K-sized chunks (`run_steps`: one lax.scan dispatch per
chunk, so the ~22 ms tunnel RTT amortizes to nothing), reporting amortized
ms/step (target <= 2 ms), plus one multiseed-COMPOSITION row (P6 x S11:
S hypothesis smoothers vmapped over the same K-step scan).

Run standalone: python bench/config5_scale.py [n_steps] — or imported by
bench.py (run() returns the row dict).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gpslam_tpu.io import synthetic
from gpslam_tpu.smoother import FixedLagSmoother, SmootherConfig


def _per_step_measurements(data, n_iv, R, dt):
    """Vectorized (n_iv, R) per-interval measurement tables from the flat
    range lists (rank-within-interval assignment, capped at R)."""
    ri = np.asarray(data["range_i"])
    order = np.argsort(ri, kind="stable")
    ri_s = ri[order]
    rank = np.arange(len(ri_s)) - np.searchsorted(ri_s, ri_s, side="left")
    keep = rank < R
    tau = np.full((n_iv, R), 0.5 * dt, np.float64)
    z = np.zeros((n_iv, R))
    lm = np.zeros((n_iv, R), np.int32)
    valid = np.zeros((n_iv, R))
    tau[ri_s[keep], rank[keep]] = np.asarray(data["range_tau"])[order][keep]
    z[ri_s[keep], rank[keep]] = np.asarray(data["range_z"])[order][keep]
    lm[ri_s[keep], rank[keep]] = np.asarray(data["range_lm"])[order][keep]
    valid[ri_s[keep], rank[keep]] = 1.0
    return tau, z, lm, valid


def run(n_steps=100_000, K=2_000, W=100, S_ms=8, ms_chunks=2):
    data = synthetic.make_linear2d_range_slam(
        n_states=n_steps + W + 1, ranges_per_interval=0.5, seed=0,
        init_noise=0.3,
    )
    dt = float(data["dt"])
    R = 4
    n_iv = n_steps + W
    tau, z, lm, valid = _per_step_measurements(data, n_iv, R, dt)

    cfg = SmootherConfig(
        window=W, ranges_per_step=R, dt=dt, qc=float(data["qc"]),
        odom_sigma=float(data["odom_sigma"]),
        range_sigma=float(data["range_sigma"]), iters_per_step=2,
    )
    L = data["landmarks_gt"].shape[0]
    sm = FixedLagSmoother(cfg, n_landmarks=L)

    init_iv = np.nonzero(np.asarray(data["range_i"]) < W - 1)[0]
    s = sm.init(
        data["init_pos"][:W], data["init_vel"][:W], data["init_landmarks"],
        odom_z=data["odom_z"][: W - 1],
        ranges={
            "interval": data["range_i"][init_iv],
            "tau": data["range_tau"][init_iv],
            "z": data["range_z"][init_iv],
            "lm": data["range_lm"][init_iv],
        },
    )
    s = sm.settle(s, iters=15)

    base = W - 1
    seqs = (
        np.asarray(data["odom_z"])[base : base + n_steps],
        tau[base : base + n_steps],
        z[base : base + n_steps],
        lm[base : base + n_steps],
        valid[base : base + n_steps],
    )

    def chunk(i):
        return tuple(q[i : i + K] for q in seqs)

    # compile + warm on chunk 0 (its steps advance the real state)
    t0c = time.perf_counter()
    s, out = sm.run_steps(s, *chunk(0))
    float(np.asarray(out["chi2"])[-1])
    t_compile = time.perf_counter() - t0c

    # timed: the remaining chunks, one fetch at the very end (dispatches
    # pipeline; the per-chunk RTT overlaps device compute)
    n_chunks = n_steps // K
    t0 = time.perf_counter()
    heads = None
    for ci in range(1, n_chunks):
        s, out = sm.run_steps(s, *chunk(ci * K))
        heads = out["head_x"]
    last_chi2 = float(np.asarray(out["chi2"])[-1])
    wall = time.perf_counter() - t0
    steps_timed = (n_chunks - 1) * K
    ms_per_step = wall / steps_timed * 1e3

    # accuracy sanity on the final chunk heads vs ground truth
    h = np.asarray(heads)
    last_base = base + (n_chunks - 1) * K
    gt = np.asarray(data["gt_pos"])[last_base + 1 : last_base + K + 1]
    rmse = float(np.sqrt(((h - gt) ** 2).sum(-1).mean()))

    row = {
        "backend": jax.default_backend(),
        "n_steps_timed": steps_timed,
        "window": W,
        "chunk_K": K,
        "iters_per_step": cfg.iters_per_step,
        "ms_per_step_amortized": round(ms_per_step, 3),
        "wall_s": round(wall, 2),
        "compile_plus_first_chunk_s": round(t_compile, 2),
        "final_chi2": last_chi2,
        "tail_rmse_m": round(rmse, 3),
    }

    # multiseed composition: S hypothesis smoothers x K-step scan, vmapped
    if S_ms:
        tile = lambda a: np.broadcast_to(  # noqa: E731
            np.asarray(a)[None], (S_ms,) + np.asarray(a).shape
        ).copy()
        s_b = jax.tree_util.tree_map(tile, s)
        sq0 = tuple(tile(q) for q in chunk(0))
        s_b, out_b = sm.run_steps_multiseed(s_b, *sq0)  # compile + warm
        float(np.asarray(out_b["chi2"])[-1, -1])
        t0 = time.perf_counter()
        done = 0
        for ci in range(1, 1 + ms_chunks):
            sq = tuple(tile(q) for q in chunk(ci * K))
            s_b, out_b = sm.run_steps_multiseed(s_b, *sq)
            done += K
        float(np.asarray(out_b["chi2"])[-1, -1])
        wall_ms_total = time.perf_counter() - t0
        row["multiseed"] = {
            "seeds": S_ms,
            "steps_per_seed": done,
            "ms_per_step_per_seed_amortized": round(
                wall_ms_total / (done * S_ms) * 1e3, 3),
        }
    return row


if __name__ == "__main__":
    import json

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(json.dumps(run(n_steps=n)))
