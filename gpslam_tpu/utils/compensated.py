"""Compensated f32 reductions for chi^2 / inner products at scale.

The reference stack runs everything in f64 (GTSAM is all-double; Eigen LLT,
`NonlinearFactorGraph::error` — SURVEY.md §2.2 S1/S4), so a million-term
chi^2 sum is a non-issue there. On TPU the compute dtype is f32 (SURVEY.md
§7 hard-part 1), and an f32 sum over ~10^6-10^7 squared residuals can lose
digits exactly where LM needs them: the accept/reject comparison of two
nearly-equal costs.

Scheme: a fully VECTORIZED compensated pairwise tree — log2(n) levels of
branch-free TwoSum (Knuth). Each level's pairwise adds are exact (sum +
recovered rounding error); the error terms accumulate in a parallel
compensation array that is folded down alongside the sums. Every level is a
full-width vector op (no sequential scalar loop — a lax.scan of scalar
steps costs ~0.5 ms per call on TPU; this is ~2x the cost of a plain sum).
Error behaves like doubly-compensated summation: ~O(eps) + O(log n * eps^2)
relative to the condition number, vs O(n * eps) for sequential f32.
"""

from __future__ import annotations

import jax.numpy as jnp

_TAIL = 128     # below this, a plain jnp.sum is already exact enough


def compensated_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of all elements of x, compensated. Shape-static (jit-safe)."""
    x = x.reshape(-1)
    if x.shape[0] <= _TAIL:
        return jnp.sum(x)
    n = x.shape[0]
    m = 1 << (n - 1).bit_length()
    s = jnp.pad(x, (0, m - n))
    comp = None
    while s.shape[0] > 1:
        h = s.shape[0] // 2
        a, b = s[:h], s[h:]
        t = a + b
        # TwoSum (Knuth, branch-free): e is the exact rounding error of a+b
        bp = t - a
        e = (a - (t - bp)) + (b - bp)
        s = t
        comp = e if comp is None else comp[:h] + comp[h:] + e
    return s[0] + comp[0]


def compensated_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a, b> with compensated accumulation (flattens both)."""
    return compensated_sum(a.reshape(-1) * b.reshape(-1))
