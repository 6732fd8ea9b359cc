"""BASELINE config 5 (single-chip slice): sliding-window incremental
smoothing over a long range-only SLAM sequence with the static-shape
fixed-lag smoother (one compiled step program, O(W log W) per step).

Run: python examples/config5_sliding_window.py [--cpu] [--states N]
"""

import sys
import time

sys.path.insert(0, ".")
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.io import synthetic
from gpslam_tpu.smoother import FixedLagSmoother, SmootherConfig


def main():
    n = 2000
    if "--states" in sys.argv:
        n = int(sys.argv[sys.argv.index("--states") + 1])
    W = 100
    data = synthetic.make_linear2d_range_slam(
        n_states=n, ranges_per_interval=0.5, seed=0, init_noise=0.3
    )
    cfg = SmootherConfig(
        window=W, ranges_per_step=4, dt=float(data["dt"]),
        qc=float(data["qc"]), odom_sigma=float(data["odom_sigma"]),
        range_sigma=float(data["range_sigma"]), iters_per_step=2,
    )
    L = data["landmarks_gt"].shape[0]
    sm = FixedLagSmoother(cfg, n_landmarks=L)

    by_iv = {}
    for k in range(data["range_i"].shape[0]):
        by_iv.setdefault(int(data["range_i"][k]), []).append(k)
    init_ks = [k for iv in range(W - 1) for k in by_iv.get(iv, [])]
    s = sm.init(
        data["init_pos"][:W], data["init_vel"][:W], data["init_landmarks"],
        odom_z=data["odom_z"][: W - 1],
        ranges={
            "interval": data["range_i"][init_ks],
            "tau": data["range_tau"][init_ks],
            "z": data["range_z"][init_ks],
            "lm": data["range_lm"][init_ks],
        },
    )
    s = sm.settle(s, iters=15)

    R = cfg.ranges_per_step
    tail = []
    t_total = 0.0
    for t in range(W - 1, n - 1):
        ks = by_iv.get(t, [])[:R]
        tau = np.full((R,), 0.5 * cfg.dt)
        z = np.zeros((R,))
        lm = np.zeros((R,), np.int32)
        valid = np.zeros((R,))
        for j, k in enumerate(ks):
            tau[j] = data["range_tau"][k]
            z[j] = data["range_z"][k]
            lm[j] = data["range_lm"][k]
            valid[j] = 1.0
        t0 = time.perf_counter()
        s, out = sm.step(s, data["odom_z"][t], tau, z, lm, valid)
        jax.block_until_ready(out["chi2"])
        if t > W:  # skip compile step
            t_total += time.perf_counter() - t0
        tail.append(np.asarray(out["x"][0]))
    tail = np.asarray(tail)
    steps = n - 1 - W
    tail_idx = np.arange(W - 1, n - 1) - W + 2
    gt = data["gt_pos"][tail_idx]
    rmse = np.sqrt(((tail - gt) ** 2).sum(-1).mean())
    print(f"{steps+1} incremental steps, window {W}, on "
          f"{jax.devices()[0].platform}")
    print(f"mean step time {1e3 * t_total / steps:.2f} ms "
          f"(constant in total trajectory length)")
    print(f"smoothed-estimate RMSE vs ground truth: {rmse:.3f} m")


if __name__ == "__main__":
    main()
