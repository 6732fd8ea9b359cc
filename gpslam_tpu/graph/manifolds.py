"""Manifold specs: the retract/local contract between values and tangents.

TPU-native replacement for the reference's Lie-group *traits* mechanism
(SURVEY.md §2.2 S2: `retract/localCoordinates` via gtsam traits). A variable
group stores its values as a pytree of arrays with a leading batch axis; the
Manifold object knows the tangent dimension and how to retract a tangent
vector onto a single value. Everything is a pure function, vmap/jit-safe.

Composite trajectory states (pose + velocity [+ acceleration]) are modeled
with `Product`, whose value is a tuple of sub-values and whose tangent is the
concatenation of sub-tangents — one "chain node" block for the block solvers.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from ..lie import se2, se3


class Manifold:
    """Base: subclasses define dim, retract(value, delta), local(a, b)."""

    dim: int

    def retract(self, value, delta):
        raise NotImplementedError

    def local(self, a, b):
        """Tangent d such that retract(a, d) == b."""
        raise NotImplementedError

    def identity(self, dtype=jnp.float32):
        raise NotImplementedError


class Vector(Manifold):
    """R^d with retract = addition."""

    def __init__(self, d: int):
        self.dim = d

    def retract(self, value, delta):
        return value + delta

    def local(self, a, b):
        return b - a

    def identity(self, dtype=jnp.float32):
        return jnp.zeros((self.dim,), dtype)

    def __repr__(self):
        return f"Vector({self.dim})"


class SE2(Manifold):
    """SE(2) poses stored as (3,) [x, y, theta]; right retraction T*Exp(d)."""

    dim = 3

    def retract(self, value, delta):
        return se2.retract(value, delta)

    def local(self, a, b):
        return se2.local_coordinates(a, b)

    def identity(self, dtype=jnp.float32):
        return jnp.zeros((3,), dtype)

    def __repr__(self):
        return "SE2()"


class SE3(Manifold):
    """SE(3) poses stored as a (R: (3,3), t: (3,)) tuple; right retraction."""

    dim = 6

    def retract(self, value, delta):
        R, t = value
        return se3.retract(R, t, delta)

    def local(self, a, b):
        return se3.local_coordinates(*a, *b)

    def identity(self, dtype=jnp.float32):
        return (jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype))

    def __repr__(self):
        return "SE3()"


class Product(Manifold):
    """Cartesian product; value = tuple of sub-values, tangent concatenated."""

    def __init__(self, parts: Tuple[Manifold, ...]):
        self.parts = tuple(parts)
        self.dim = sum(p.dim for p in self.parts)
        self._offsets = []
        off = 0
        for p in self.parts:
            self._offsets.append(off)
            off += p.dim

    def retract(self, value, delta):
        out = []
        for p, off, v in zip(self.parts, self._offsets, value):
            out.append(p.retract(v, delta[..., off : off + p.dim]))
        return tuple(out)

    def local(self, a, b):
        return jnp.concatenate(
            [p.local(va, vb) for p, va, vb in zip(self.parts, a, b)], axis=-1
        )

    def identity(self, dtype=jnp.float32):
        return tuple(p.identity(dtype) for p in self.parts)

    def __repr__(self):
        return f"Product({self.parts})"


# Canonical trajectory-state manifolds (the chain-node blocks):
def linear_state(d: int) -> Product:
    """WNOA vector state: (position R^d, velocity R^d), block dim 2d."""
    return Product((Vector(d), Vector(d)))


def linear_wnoj_state(d: int) -> Product:
    """WNOJ vector state: (pos, vel, acc), block dim 3d."""
    return Product((Vector(d), Vector(d), Vector(d)))


def se2_state() -> Product:
    """SE(2) WNOA state: (pose, body velocity R^3), block dim 6."""
    return Product((SE2(), Vector(3)))


def se3_state() -> Product:
    """SE(3) WNOA state: (pose, body twist R^6), block dim 12."""
    return Product((SE3(), Vector(6)))


def se3_wnoj_state() -> Product:
    """SE(3) WNOJ state: (pose, twist, twist-acceleration), block dim 18."""
    return Product((SE3(), Vector(6), Vector(6)))
