"""SPMD parallelism: mesh, factor sharding (P1), supernode sharding (P2),
subtree pipelining (P3), time sharding (P4), multi-seed vmap (P6) —
SURVEY.md §2.4."""

from .mesh import init_distributed, make_mesh  # noqa: F401
from .solve import lm_solve_multiseed, lm_solve_sharded, pad_graph  # noqa: F401
from .subtree_shard import (  # noqa: F401
    SubtreeShardedSolver,
    lm_solve_subtree_sharded,
)
from .supernodal_shard import (  # noqa: F401
    ShardedAmalgamatedSupernodalSolver,
    ShardedSupernodalSolver,
    lm_solve_supernodal_sharded,
)
from .time_shard import (  # noqa: F401
    lm_solve_time_sharded,
    spike_schur_arrowhead_solve,
    spike_solve,
)
