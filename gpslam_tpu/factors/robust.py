"""Robust m-estimators (reference: gtsam/linear/NoiseModel.h mEstimator
namespace, SURVEY.md §2.2 S3): Huber, Cauchy, Tukey, Geman-McClure, DCS,
Welsch — as whitened-residual reweighting (IRLS).

Contract (matches GTSAM's Robust noise model):
  - factor residuals r are already whitened by the base noise model;
  - graph error uses loss(|r|) instead of 0.5 |r|^2;
  - linearization scales (r, J) by sqrt(weight(|r|)), weight = loss'(e)/e —
    the standard IRLS Gauss-Newton approximation (no second-order Triggs
    correction, same as the reference).

All functions are (name, k) -> elementwise fns of the residual NORM e >= 0,
AD-safe at e = 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_div(a, b):
    return a / jnp.where(b == 0, jnp.ones_like(b), b)


def huber_loss(e, k):
    quad = 0.5 * e * e
    lin = k * (e - 0.5 * k)
    return jnp.where(e <= k, quad, lin)


def huber_weight(e, k):
    return jnp.where(e <= k, jnp.ones_like(e), _safe_div(k * jnp.ones_like(e), e))


def cauchy_loss(e, k):
    return 0.5 * k * k * jnp.log1p((e / k) ** 2)


def cauchy_weight(e, k):
    return 1.0 / (1.0 + (e / k) ** 2)


def tukey_loss(e, k):
    k2 = k * k
    inside = (k2 / 6.0) * (1.0 - (1.0 - (e / k) ** 2) ** 3)
    return jnp.where(e <= k, inside, jnp.full_like(e, k2 / 6.0))


def tukey_weight(e, k):
    w = (1.0 - (e / k) ** 2) ** 2
    return jnp.where(e <= k, w, jnp.zeros_like(e))


def geman_mcclure_loss(e, k):
    # GTSAM GemanMcClure: 0.5 * k^2 e^2 / (k^2 + e^2)
    k2 = k * k
    return 0.5 * k2 * e * e / (k2 + e * e)


def geman_mcclure_weight(e, k):
    k2 = k * k
    return (k2 / (k2 + e * e)) ** 2


def dcs_loss(e, k):
    """Dynamic Covariance Scaling (Agarwal et al. ICRA'13): quadratic for
    e^2 <= phi (=k), saturating outside. The loss is the antiderivative of
    e * weight(e) with the standard DCS weight s^2, s = 2phi/(phi+e^2),
    made continuous at the switch: rho = 3phi/2 - 2phi^2/(phi+e^2)."""
    e2 = e * e
    outside = 1.5 * k - 2.0 * k * k / (k + e2)
    return jnp.where(e2 <= k, 0.5 * e2, outside)


def dcs_weight(e, k):
    e2 = e * e
    s = 2.0 * k / (k + e2)
    return jnp.where(e2 <= k, jnp.ones_like(e), s * s)


def welsch_loss(e, k):
    k2 = k * k
    return 0.5 * k2 * (1.0 - jnp.exp(-(e * e) / k2))


def welsch_weight(e, k):
    return jnp.exp(-(e * e) / (k * k))


_LOSSES = {
    "huber": (huber_loss, huber_weight),
    "cauchy": (cauchy_loss, cauchy_weight),
    "tukey": (tukey_loss, tukey_weight),
    "geman_mcclure": (geman_mcclure_loss, geman_mcclure_weight),
    "dcs": (dcs_loss, dcs_weight),
    "welsch": (welsch_loss, welsch_weight),
}


def get(name: str):
    """(loss_fn, weight_fn) for an m-estimator name."""
    if name not in _LOSSES:
        raise ValueError(f"unknown m-estimator {name!r}; have {sorted(_LOSSES)}")
    return _LOSSES[name]


def residual_norm(r, eps=1e-12):
    """AD-safe |r| along the last axis."""
    return jnp.sqrt(jnp.sum(r * r, axis=-1) + eps)
