"""BCR block-tridiagonal solver + arrowhead Schur tests: parity against
dense f64 solves, and chain-solver LM parity against the dense backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain, tridiag
from gpslam_tpu.solve import lm_solve, make_dense_solver

RNG = np.random.default_rng(7)


def random_block_tridiag(n, b, k, scale=1.0):
    """SPD block-tridiagonal (diagonally dominant)."""
    D = RNG.normal(size=(n, b, b))
    D = D @ D.transpose(0, 2, 1) + (4.0 + b) * np.eye(b)[None]
    U = scale * RNG.normal(size=(n, b, b))
    U[-1] = 0.0
    r = RNG.normal(size=(n, b, k))
    return jnp.asarray(D), jnp.asarray(U), jnp.asarray(r)


def dense_from_blocks(D, U):
    n, b, _ = D.shape
    H = np.zeros((n * b, n * b))
    for i in range(n):
        H[i * b:(i + 1) * b, i * b:(i + 1) * b] = D[i]
        if i + 1 < n:
            H[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = U[i]
            H[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = U[i].T
    return H


# (n, b) pairs cover: base case, non-power-of-2, power-of-2, large, and the
# production block sizes; the full cross product added ~2 min of XLA compile
# per run for no extra coverage
@pytest.mark.parametrize("n,b", [(1, 4), (3, 2), (5, 6), (8, 4), (13, 4),
                                 (17, 2), (64, 6)])
def test_bcr_matches_dense(n, b):
    D, U, r = random_block_tridiag(n, b, k=3)
    x = tridiag.bcr_solve(D, U, r)
    H = dense_from_blocks(np.asarray(D), np.asarray(U))
    x_dense = np.linalg.solve(H, np.asarray(r).reshape(n * b, 3))
    np.testing.assert_allclose(np.asarray(x).reshape(n * b, 3), x_dense,
                               atol=1e-9)


def test_bcr_jits():
    D, U, r = random_block_tridiag(33, 4, k=2)
    f = jax.jit(tridiag.bcr_solve)
    np.testing.assert_allclose(f(D, U, r), tridiag.bcr_solve(D, U, r),
                               rtol=1e-10)


def test_schur_arrowhead_matches_dense():
    n, b, L, dl = 11, 4, 3, 2
    P = L * dl
    D, U, _ = random_block_tridiag(n, b, k=1)
    H_sl = jnp.asarray(RNG.normal(size=(n, b, P)) * 0.3)
    A = RNG.normal(size=(P, P))
    H_ll = jnp.asarray(A @ A.T + 5.0 * np.eye(P))
    g_s = jnp.asarray(RNG.normal(size=(n, b)))
    g_l = jnp.asarray(RNG.normal(size=(P,)))
    lam = 0.0

    ds, dl_sol = tridiag.schur_arrowhead_solve(
        D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping=False
    )
    # dense check
    Hd = np.zeros((n * b + P, n * b + P))
    Hd[: n * b, : n * b] = dense_from_blocks(np.asarray(D), np.asarray(U))
    Hd[: n * b, n * b:] = np.asarray(H_sl).reshape(n * b, P)
    Hd[n * b:, : n * b] = np.asarray(H_sl).reshape(n * b, P).T
    Hd[n * b:, n * b:] = np.asarray(H_ll)
    g = np.concatenate([np.asarray(g_s).ravel(), np.asarray(g_l)])
    sol = np.linalg.solve(Hd, -g)
    np.testing.assert_allclose(np.asarray(ds).ravel(), sol[: n * b], atol=1e-9)
    np.testing.assert_allclose(np.asarray(dl_sol), sol[n * b:], atol=1e-9)


def test_schur_with_damping_matches_dense():
    n, b, L, dl = 6, 4, 2, 2
    P = L * dl
    D, U, _ = random_block_tridiag(n, b, k=1)
    H_sl = jnp.asarray(RNG.normal(size=(n, b, P)) * 0.3)
    A = RNG.normal(size=(P, P))
    H_ll = jnp.asarray(A @ A.T + 5.0 * np.eye(P))
    g_s = jnp.asarray(RNG.normal(size=(n, b)))
    g_l = jnp.asarray(RNG.normal(size=(P,)))
    lam = 0.37
    ds, dl_sol = tridiag.schur_arrowhead_solve(
        D, U, g_s, H_sl, H_ll, g_l, lam, diagonal_damping=False
    )
    Hd = np.zeros((n * b + P, n * b + P))
    Hd[: n * b, : n * b] = dense_from_blocks(np.asarray(D), np.asarray(U))
    Hd[: n * b, n * b:] = np.asarray(H_sl).reshape(n * b, P)
    Hd[n * b:, : n * b] = np.asarray(H_sl).reshape(n * b, P).T
    Hd[n * b:, n * b:] = np.asarray(H_ll)
    Hd += lam * np.eye(n * b + P)
    g = np.concatenate([np.asarray(g_s).ravel(), np.asarray(g_l)])
    sol = np.linalg.solve(Hd, -g)
    np.testing.assert_allclose(np.asarray(ds).ravel(), sol[: n * b], atol=1e-9)
    np.testing.assert_allclose(np.asarray(dl_sol), sol[n * b:], atol=1e-9)


def test_chain_solver_parity_with_dense_backend():
    """Full LM with the chain+Schur backend == dense backend (f64)."""
    data = synthetic.make_linear2d_range_slam(n_states=40, seed=9)
    graph, values = linear2d.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph)
    vals_c, stats_c = lm_solve(graph, values, LMConfig(), solver=solver)
    vals_d, stats_d = lm_solve(graph, values, LMConfig(),
                               solver=make_dense_solver(False))
    assert float(stats_c.error) == pytest.approx(float(stats_d.error), rel=1e-9)


def test_chain_solver_rejects_loop_closures():
    from gpslam_tpu.models import pose2_slam

    data = synthetic.make_se2_pose_graph(n_states=120, seed=4)
    assert data["lc_i"].shape[0] > 0
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    with pytest.raises(ValueError, match="non-adjacent"):
        chain.make_chain_solver(graph, lm_group=None)


def test_chain_solver_no_landmarks():
    from gpslam_tpu.models import pose2_slam

    data = synthetic.make_se2_pose_graph(n_states=50, seed=5,
                                         loop_closure_prob=0.0)
    data["lc_i"] = np.zeros((0,), np.int64)
    data["lc_j"] = np.zeros((0,), np.int64)
    data["lc_z"] = np.zeros((0, 3))
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    solver = chain.make_chain_solver(graph, lm_group=None)
    vals_c, stats_c = lm_solve(graph, values, LMConfig(), solver=solver)
    vals_d, stats_d = lm_solve(graph, values, LMConfig(),
                               solver=make_dense_solver(False))
    assert float(stats_c.error) == pytest.approx(float(stats_d.error), rel=1e-9)
