"""Pallas fused Cholesky-solve kernel: interpret-mode equivalence vs the XLA
small-block path (the §5.2 sanitizer discipline for hand-written kernels)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.ops import pallas_chol, smallblock as sb

RNG = np.random.default_rng(61)


@pytest.mark.parametrize("n,b,k", [(100, 4, 1), (513, 4, 9), (64, 6, 2),
                                   (1024, 2, 3)])
def test_pallas_kernel_matches_smallblock(n, b, k):
    A = RNG.normal(size=(n, b, b))
    A = A @ A.transpose(0, 2, 1) + (4 + b) * np.eye(b)[None]
    B = RNG.normal(size=(n, b, k))
    A32 = jnp.asarray(A, jnp.float32)
    B32 = jnp.asarray(B, jnp.float32)
    x_pallas = pallas_chol.chol_solve_lanes(A32, B32, tile_n=128,
                                            interpret=True)
    x_ref = sb.chol_solve(sb.cholesky(A32), B32)
    np.testing.assert_allclose(np.asarray(x_pallas), np.asarray(x_ref),
                               atol=2e-4, rtol=2e-4)
    # against dense f64 truth
    x_true = np.linalg.solve(A, B)
    np.testing.assert_allclose(np.asarray(x_pallas, np.float64), x_true,
                               atol=5e-3)
