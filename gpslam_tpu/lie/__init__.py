"""Batched Lie-group layer (reference: gtsam/geometry, SURVEY.md §2.2 S2)."""

from . import se2, se3, so3  # noqa: F401
