"""Block-Jacobi-preconditioned conjugate gradients on the normal equations —
the scalable general-graph backend (SURVEY.md §7: covers loop-closure pose
graphs where the chain solver's structure check fails, without materializing
a dense Hessian; the supernodal Cholesky is the exact-factorization
alternative).

Matrix-free (ops/matfree.py): each CG iteration costs two gathers + two
scatter-adds per factor batch — all large batched tensor ops. The
preconditioner is the inverse of the per-variable diagonal block of H
(damped), applied with the unrolled small-block kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import matfree, smallblock as sb


def make_pcg_solver(max_iters: int = 250, tol: float = 1e-8,
                    diagonal_damping: bool = False):
    """Linear solver with the lm_solve interface:
    solver(graph, values, lins, lam) -> delta_by_group."""

    def solver(graph, values, lins, lam):
        dtype = jax.tree_util.tree_leaves(values)[0].dtype
        lam = jnp.asarray(lam, dtype)
        g = matfree.gradient(graph, lins, values)
        Dblocks = matfree.block_diagonal(graph, lins, values)

        def damp(block):
            d = block.shape[-1]
            if diagonal_damping:
                diag = jnp.maximum(
                    jnp.diagonal(block, axis1=-2, axis2=-1), 1e-10
                )
                return block + lam * jax.vmap(jnp.diag)(diag)
            return block + lam * jnp.eye(d, dtype=dtype)

        Dd = {k: damp(v) for k, v in Dblocks.items()}
        Lchol = {k: sb.cholesky(v) for k, v in Dd.items()}

        def A(v):
            Hv = matfree.hessian_vec(graph, lins, v)
            return jax.tree_util.tree_map(
                lambda hv, x: hv + lam * x, Hv, v
            )

        def M_inv(r):
            return {
                k: sb.chol_solve(Lchol[k], r[k][..., None])[..., 0] for k in r
            }

        b = jax.tree_util.tree_map(lambda x: -x, g)
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
        r0 = b  # A x0 = 0
        z0 = M_inv(r0)
        p0 = z0
        rz0 = matfree.tree_dot(r0, z0)
        b_norm2 = matfree.tree_dot(b, b)
        tol2 = tol * tol * jnp.maximum(b_norm2, 1e-30)

        def cond(carry):
            _, r, _, _, k = carry[0], carry[1], carry[2], carry[3], carry[4]
            rr = matfree.tree_dot(r, r)
            return jnp.logical_and(k < max_iters, rr > tol2)

        def body(carry):
            x, r, p, rz, k = carry
            Ap = A(p)
            alpha = rz / jnp.maximum(matfree.tree_dot(p, Ap), 1e-30)
            x = matfree.tree_add(x, p, alpha)
            r = matfree.tree_add(r, Ap, -alpha)
            z = M_inv(r)
            rz_new = matfree.tree_dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = matfree.tree_add(z, p, beta)
            return (x, r, p, rz_new, k + 1)

        x, r, _, _, iters = jax.lax.while_loop(
            cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32))
        )
        return x

    return solver
