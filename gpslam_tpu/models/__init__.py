"""Model builders: dataset dict -> (Graph, initial Values) (ref G12)."""

from . import linear2d, pose2_slam  # noqa: F401
