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


def test_bcr_pallas_path_matches_xla():
    """Full BCR solve with the Pallas per-level kernel (interpret mode on
    CPU) == the XLA unrolled path, including the arrowhead Schur variant."""
    import jax.numpy as jnp

    from gpslam_tpu.ops import tridiag

    n, b, k = 600, 4, 3
    A = RNG.normal(size=(n, b, b)) * 0.1
    D = A @ A.transpose(0, 2, 1) + 6 * np.eye(b)[None]
    U = RNG.normal(size=(n, b, b)) * 0.3
    U[-1] = 0.0
    r = RNG.normal(size=(n, b, k))
    D32, U32, r32 = (jnp.asarray(x, jnp.float32) for x in (D, U, r))

    x_xla = tridiag.bcr_solve(D32, U32, r32)
    x_pl = tridiag.bcr_solve(D32, U32, r32, use_pallas=True,
                             pallas_min_n=64, interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_xla),
                               atol=5e-4, rtol=5e-4)


def test_chain_solver_pallas_flag_matches():
    """make_chain_solver(use_pallas=True) parity on a landmark problem."""
    import jax.numpy as jnp

    from gpslam_tpu.graph import graph as graphlib
    from gpslam_tpu.io import synthetic
    from gpslam_tpu.models import linear2d
    from gpslam_tpu.ops import chain

    data = synthetic.make_linear2d_range_slam(n_states=300, seed=3)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    lins = graphlib.linearize(graph, values)
    lam = jnp.asarray(0.01, jnp.float32)

    d_xla = chain.make_chain_solver(graph)(graph, values, lins, lam)
    d_pl = chain.make_chain_solver(graph, use_pallas=True, pallas_min_n=32,
                                   interpret=True)(graph, values, lins, lam)
    for g in d_xla:
        np.testing.assert_allclose(np.asarray(d_pl[g]), np.asarray(d_xla[g]),
                                   atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("n,b,k", [(3000, 4, 3), (2048, 4, 1), (1500, 3, 2),
                                   (1536, 12, 1), (1280, 12, 6)])
def test_bcr_fused_level_kernels_match_xla(n, b, k):
    """Fused plane-major Pallas BCR level kernels (interpret mode) == XLA."""
    import jax.numpy as jnp

    from gpslam_tpu.ops import pallas_bcr, tridiag

    A = RNG.normal(size=(n, b, b)).astype(np.float32) * 0.1
    D = A @ A.transpose(0, 2, 1) + 6 * np.eye(b, dtype=np.float32)
    U = (RNG.normal(size=(n, b, b)) * 0.3).astype(np.float32)
    U[-1] = 0
    r = RNG.normal(size=(n, b, k)).astype(np.float32)
    D, U, r = map(jnp.asarray, (D, U, r))

    x_ref = tridiag.bcr_solve(D, U, r)
    x_f = pallas_bcr.bcr_solve_fused(D, U, r, min_pallas_n=512, tile_m=2,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               atol=1e-4, rtol=1e-4)


def test_bcr_fused_fallthrough_small_and_f64():
    """The fused entry point silently falls back when Pallas can't apply."""
    import jax.numpy as jnp

    from gpslam_tpu.ops import pallas_bcr, tridiag

    n, b = 64, 4
    A = RNG.normal(size=(n, b, b)) * 0.1
    D = jnp.asarray(A @ A.transpose(0, 2, 1) + 6 * np.eye(b))
    U = jnp.asarray(RNG.normal(size=(n, b, b)) * 0.3).at[-1].set(0.0)
    r = jnp.asarray(RNG.normal(size=(n, b, 1)))
    x_f = pallas_bcr.bcr_solve_fused(D, U, r)  # f64 -> XLA path
    x_ref = tridiag.bcr_solve(D, U, r)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), atol=1e-10)


@pytest.mark.parametrize("n,b,k", [(1024, 18, 1)])
def test_bcr_fused_v3_large_block_matches_xla(n, b, k):
    """v3 split-kernel pipeline for 12 < b <= 24 (WNOJ SE(3) b=18, VERDICT
    r3 item 3): interpret-mode parity vs the XLA BCR path. ONE case only:
    the interpreted v3 level is a ~150k-equation jaxpr whose XLA-CPU compile
    costs ~8 min cold (seconds warm via the persistent compile cache);
    measured maxdiff 7.5e-8 at this shape."""
    import jax.numpy as jnp

    from gpslam_tpu.ops import pallas_bcr, tridiag

    A = RNG.normal(size=(n, b, b)).astype(np.float32) * 0.1
    D = A @ A.transpose(0, 2, 1) + (4 + b) * np.eye(b, dtype=np.float32)
    U = (RNG.normal(size=(n, b, b)) * 0.3).astype(np.float32)
    U[-1] = 0
    r = RNG.normal(size=(n, b, k)).astype(np.float32)
    D, U, r = map(jnp.asarray, (D, U, r))

    x_ref = tridiag.bcr_solve(D, U, r)
    x_f = pallas_bcr.bcr_solve_fused(D, U, r, min_pallas_n=512, tile_m=2,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               atol=2e-4, rtol=2e-4)
