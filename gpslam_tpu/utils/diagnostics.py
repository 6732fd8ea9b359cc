"""Solver diagnostics (SURVEY.md §5.3 / §5.5).

- per-factor error reports (the reference's `graph.printErrors` analog);
- non-PD detection for the block factorizations: the reference throws
  IndeterminantLinearSystemException from rank-deficient cliques; here the
  equivalent signal is a per-block boolean (diagonal of the unrolled
  Cholesky finite and positive). The LM loop already recovers on-device
  (non-finite candidate errors are rejected and lambda raised, no host
  round-trip); these helpers surface WHERE the system went indefinite for
  debugging.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..graph import graph as graphlib


def per_batch_errors(graph, values) -> Dict[str, np.ndarray]:
    """{batch_name: (M,) per-factor 0.5|r|^2} — printErrors analog."""
    out = {}
    for b in graph.batches:
        r = graphlib.batch_residuals(b, values)
        out[b.name] = np.asarray(0.5 * jnp.sum(r * r, axis=-1))
    return out


def print_errors(graph, values, top: int = 10) -> str:
    """Human-readable worst-factor report."""
    lines = []
    for name, e in per_batch_errors(graph, values).items():
        order = np.argsort(-e)[:top]
        lines.append(
            f"{name}: total {e.sum():.4f}, max {e.max():.4f} "
            f"(worst factors: {[(int(i), round(float(e[i]), 3)) for i in order[:5]]})"
        )
    return "\n".join(lines)


def cholesky_status(D) -> jnp.ndarray:
    """(N,) bool: True where the (damped) diagonal block is numerically PD.

    Checks the unrolled Cholesky diagonal for positivity/finiteness — the
    per-supernode status array of SURVEY.md §5.3.
    """
    from ..ops import smallblock as sb

    L = sb.cholesky(D)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)
