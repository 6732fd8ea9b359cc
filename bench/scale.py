"""Scale benchmark: million-state chain solves (BASELINE config 5 scale,
single chip) — wall-clock of the BCR linear solve and of a full LM solve on
growing trajectory lengths.

Run: python bench/scale.py [--cpu] [--max-exp E]   (N = 2^E, default 20 = 1M)
"""

import sys
import time

sys.path.insert(0, ".")
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpslam_tpu.ops import tridiag


def bench_bcr(n, b=4, k=1, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    D = rng.normal(size=(n, b, b))
    D = D @ D.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    U = 0.5 * rng.normal(size=(n, b, b))
    U[-1] = 0
    r = rng.normal(size=(n, b, k))
    D, U, r = (jnp.asarray(x, dtype) for x in (D, U, r))
    # time to a HOST-FETCHED scalar: block_until_ready proved unreliable
    # through the axon tunnel (reported sub-RTT "timings"); jnp.sum inside
    # jit keeps the transfer tiny while forcing full execution
    f = jax.jit(lambda D, U, r: jnp.sum(
        tridiag.bcr_solve_auto(D, U, r, use_pallas="--no-pallas" not in sys.argv)
    ))
    float(f(D, U, r))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(D, U, r))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    max_exp = 20
    if "--max-exp" in sys.argv:
        max_exp = int(sys.argv[sys.argv.index("--max-exp") + 1])
    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    for e in range(12, max_exp + 1, 2):
        n = 1 << e
        t = bench_bcr(n)
        print(f"BCR solve N=2^{e}={n:>9}: {t*1e3:9.2f} ms "
              f"({n/t/1e6:7.2f} Mstates/s)", flush=True)


if __name__ == "__main__":
    main()
