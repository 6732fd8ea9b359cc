"""SPMD parallelism: mesh, factor sharding, multi-seed vmap (ref §2.4)."""

from .mesh import make_mesh  # noqa: F401
from .solve import lm_solve_multiseed, lm_solve_sharded, pad_graph  # noqa: F401
