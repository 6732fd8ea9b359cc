"""Independent dense f64 LM reference solver (SURVEY.md §4: "tiny problems
solved by an independent dense NumPy reference solver written once for
testing only").

Residuals/Jacobians come from the library's factor kernels (those are
validated separately against finite differences and golden values); the
ASSEMBLY (explicit python loops, no scatter tricks), the LINEAR SOLVE
(numpy lstsq-grade Cholesky), and the LM SCHEDULE (plain python loop) are
written independently here, cross-checking the library's scatter-add
assembly and on-device while_loop against straightforward code.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gpslam_tpu.graph import graph as graphlib


def _layout(graph, values):
    layout = {}
    off = 0
    for g, v in values.items():
        n = jax.tree_util.tree_leaves(v)[0].shape[0]
        d = graph.manifolds[g].dim
        layout[g] = (off, d, n)
        off += n * d
    return layout, off


def chi2(graph, values) -> float:
    return float(graphlib.error(graph, values))


def solve_reference(graph, values, max_iterations=100, lambda_init=1e-5,
                    lambda_factor=10.0, lambda_max=1e5, rel_tol=1e-5,
                    abs_tol=1e-5, diagonal_damping=False):
    """Returns (values, info dict)."""
    layout, D = _layout(graph, values)
    lam = lambda_init
    # jit the (library-side) residual/Jacobian evaluation once — the
    # independent parts of this reference are assembly/solve/schedule
    lin_fn = jax.jit(lambda v: graphlib.linearize(graph, v))
    err_fn = jax.jit(lambda v: graphlib.error(graph, v))
    err = float(err_fn(values))
    history = [err]
    for it in range(max_iterations):
        lins = lin_fn(values)
        H = np.zeros((D, D))
        g = np.zeros((D,))
        for batch, lin in zip(graph.batches, lins):
            r = np.asarray(lin.r, np.float64)
            Js = [np.asarray(J, np.float64) for J in lin.J]
            idx_np = [np.asarray(ix) for ix in batch.idx]
            M = r.shape[0]
            for m in range(M):
                rows_all = []
                for s, gname in enumerate(batch.groups):
                    off, d, _ = layout[gname]
                    i = int(idx_np[s][m])
                    rows_all.append(np.arange(off + i * d, off + (i + 1) * d))
                for s in range(len(batch.groups)):
                    g[rows_all[s]] += Js[s][m].T @ r[m]
                    for t in range(len(batch.groups)):
                        H[np.ix_(rows_all[s], rows_all[t])] += Js[s][m].T @ Js[t][m]
        d_damp = np.maximum(np.diag(H), 1e-10) if diagonal_damping else np.ones(D)
        delta = np.linalg.solve(H + lam * np.diag(d_damp), -g)
        # split + retract
        delta_by_group = {}
        for gname, (off, d, n) in layout.items():
            delta_by_group[gname] = jnp.asarray(
                delta[off : off + n * d].reshape(n, d)
            )
        candidate = graphlib.retract_all(graph, values, delta_by_group)
        new_err = float(err_fn(candidate))
        if new_err < err:
            values = candidate
            converged = (err - new_err) <= rel_tol * err or (err - new_err) <= abs_tol
            err = new_err
            lam = max(lam / lambda_factor, 1e-10)
            history.append(err)
            if converged:
                return values, {"chi2": err, "iterations": it + 1,
                                "converged": True, "history": history}
        else:
            lam *= lambda_factor
            if lam > lambda_max:
                return values, {"chi2": err, "iterations": it + 1,
                                "converged": False, "history": history}
    return values, {"chi2": err, "iterations": max_iterations,
                    "converged": False, "history": history}
