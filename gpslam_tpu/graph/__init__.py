"""Graph layer: typed factor tables, Values, manifolds (ref S4-S5)."""

from . import manifolds  # noqa: F401
from .build import GraphBuilder  # noqa: F401
from .graph import (  # noqa: F401
    FactorBatch,
    Graph,
    LinearizedBatch,
    batch_residuals,
    error,
    gather,
    linearize,
    linearize_batch,
    retract_all,
)
