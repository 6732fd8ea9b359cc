"""Device-mesh helpers (SURVEY.md §5.8: the single comms backend).

Axis-name conventions used across the framework:
  "factor"  factor-block data parallelism (P1): residual/Jacobian kernels
            sharded over factors, psum assembly
  "time"    trajectory/sequence sharding (P4): contiguous chunks of the chain
  "batch"   vmapped hypothesis/seed dimension (P6)
XLA lowers all collectives over these axes to ICI (intra-slice) / DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bootstrap (SURVEY.md §5.8a): thin wrapper over
    jax.distributed.initialize. On single-host (or when already initialized)
    this is a no-op, so the same entry point works for 1-host dev runs and
    N-host pods (args default to TPU auto-detection on Cloud TPU)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process run without coordinator


def global_put(tree, mesh: Mesh, specs):
    """Commit a host-replicated pytree to its GLOBAL mesh sharding.

    `specs` is a pytree of PartitionSpec matching `tree` (the same object
    passed to shard_map's in_specs). Multi-process runs (N >= 2 hosts,
    SURVEY.md §5.8a) require inputs to be globally-committed jax.Arrays —
    every process holds the full host value and contributes its addressable
    shards. Single-process this is a no-op (jit commits inputs itself).
    """
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec

    sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )
    return jax.device_put(tree, sh)


def make_mesh(n_devices: int | None = None, axis_name: str = "factor") -> Mesh:
    """1-D mesh over the first n_devices (default: all) local devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))
