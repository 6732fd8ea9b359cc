"""Numerical-derivative checking (reference: gtsam/base/numericalDerivative.h,
SURVEY.md §2.2 S13) — central finite differences on manifolds, for validating
hand-written or AD factor Jacobians in user code and tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def numerical_jacobian(f, manifold, value, eps: float = 1e-6):
    """d f(retract(value, d)) / d d at d = 0, by central differences.

    f maps a manifold value to an (r,) vector; returns (r, manifold.dim).
    """
    dim = manifold.dim
    cols = []
    for k in range(dim):
        d = jnp.zeros((dim,)).at[k].set(eps)
        fp = np.asarray(f(manifold.retract(value, d)), np.float64)
        fm = np.asarray(f(manifold.retract(value, -d)), np.float64)
        cols.append((fp - fm) / (2 * eps))
    return np.stack(cols, axis=-1)


def check_factor_jacobians(residual, manifolds_by_slot, values_by_slot,
                           params, atol: float = 1e-5) -> None:
    """Assert the AD linearization of a factor matches finite differences.

    residual(*slot_values, params) -> (r,); manifolds_by_slot / values_by_slot
    are tuples over the factor's slots.
    """
    import jax

    dims = [m.dim for m in manifolds_by_slot]

    def at_delta(deltas):
        vals = tuple(
            m.retract(v, d)
            for m, v, d in zip(manifolds_by_slot, values_by_slot, deltas)
        )
        return residual(*vals, params)

    zeros = tuple(jnp.zeros((d,)) for d in dims)
    J_ad = jax.jacfwd(at_delta)(zeros)
    for s, (m, v) in enumerate(zip(manifolds_by_slot, values_by_slot)):
        def f_slot(x, s=s):
            vals = list(values_by_slot)
            vals[s] = x
            return residual(*vals, params)

        J_num = numerical_jacobian(f_slot, m, v)
        np.testing.assert_allclose(np.asarray(J_ad[s]), J_num, atol=atol)
