"""GraphBuilder: host-side graph construction (SURVEY.md §7 "CPU does
symbolic work once per sparsity pattern").

The builder accumulates variable groups and *bulk* factor batches (arrays,
not per-factor objects — adding 10k range factors is one call with (10k,)
index/measurement arrays), then freezes into the pytree `Graph`. Factor
batches of the same (name, residual) added incrementally are concatenated at
build time.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import FactorBatch, Graph
from .manifolds import Manifold


def _arange_tags(idx):
    """Per-slot static hints: k0 if idx[s] == arange(k0, k0+M) else None."""
    tags = []
    for i in idx:
        i = np.asarray(i)
        if i.shape[0] and np.array_equal(i, np.arange(i[0], i[0] + i.shape[0])):
            tags.append(int(i[0]))
        else:
            tags.append(None)
    return tuple(tags)


class GraphBuilder:
    def __init__(self):
        self._manifolds: Dict[str, Manifold] = {}
        self._batches: List[FactorBatch] = []

    def add_group(self, name: str, manifold: Manifold) -> "GraphBuilder":
        if name in self._manifolds:
            raise ValueError(f"group {name!r} already exists")
        self._manifolds[name] = manifold
        return self

    def add_factors(
        self,
        name: str,
        residual: Callable,
        groups: Tuple[str, ...],
        idx: Tuple[Any, ...],
        params: Any,
        rdim: int,
        mask: Any = None,
        robust=None,
        linearizer=None,
    ) -> "GraphBuilder":
        """Add a homogeneous batch of factors.

        idx: per slot, (M,) integer array of rows into that slot's group.
        params: pytree of (M, ...) arrays. mask: optional (M,) 0/1 weights.
        robust: optional ("huber"|"cauchy"|..., k) m-estimator tuple.
        """
        for g in groups:
            if g not in self._manifolds:
                raise ValueError(f"unknown group {g!r}; add_group first")
        # idx arrays are STRUCTURAL: they drive host-side symbolic analysis
        # (role tables, orderings, schedules) and must stay host-resident
        # numpy — eager device arrays would force a device fetch per
        # structural query (catastrophic through a remote-TPU tunnel) and a
        # per-shape transfer executable on some PJRT backends. jit uploads
        # them with the other arguments when the solve runs. Builders are
        # therefore host-only by contract: traced idx cannot drive symbolic
        # analysis, so reject them here with a clear error rather than deep
        # inside build()/merge.
        if any(isinstance(i, jax.core.Tracer) for i in idx):
            raise TypeError(
                f"add_factors({name!r}): idx arrays must be concrete host "
                f"integers (numpy), not jit tracers — graph construction is "
                f"host-side symbolic work; build the graph outside jit and "
                f"pass it in as an argument"
            )
        idx = tuple(np.ascontiguousarray(np.asarray(i), np.int32)
                    for i in idx)
        sizes = {i.shape[0] for i in idx}
        if len(sizes) != 1:
            raise ValueError(f"slot index arrays disagree on batch size: {sizes}")
        params = jax.tree_util.tree_map(jnp.asarray, params)
        if mask is not None:
            mask = jnp.asarray(mask)
        self._batches.append(
            FactorBatch(
                idx=idx, params=params, name=name, residual=residual,
                groups=tuple(groups), rdim=rdim, mask=mask, robust=robust,
                linearizer=linearizer, idx_arange=_arange_tags(idx),
            )
        )
        return self

    def build(self) -> Graph:
        """Freeze. Batches with identical (name, residual, groups) merge."""
        merged: Dict[Tuple, List[FactorBatch]] = {}
        order: List[Tuple] = []
        for b in self._batches:
            key = (b.name, b.residual, b.groups, b.rdim, b.robust, b.linearizer)
            if key not in merged:
                merged[key] = []
                order.append(key)
            merged[key].append(b)
        out = []
        for key in order:
            bs = merged[key]
            if len(bs) == 1:
                out.append(bs[0])
            else:
                idx = tuple(
                    np.concatenate([np.asarray(b.idx[s]) for b in bs])
                    for s in range(len(bs[0].idx))
                )
                params = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *[b.params for b in bs]
                )
                if any(b.mask is not None for b in bs):
                    mask = jnp.concatenate([
                        b.mask if b.mask is not None
                        else jnp.ones((b.size,), jnp.float32)
                        for b in bs
                    ])
                else:
                    mask = None
                out.append(
                    FactorBatch(
                        idx=idx, params=params, name=bs[0].name,
                        residual=bs[0].residual, groups=bs[0].groups,
                        rdim=bs[0].rdim, mask=mask, robust=bs[0].robust,
                        linearizer=bs[0].linearizer, idx_arange=_arange_tags(idx),
                    )
                )
        return Graph(batches=tuple(out), manifolds=dict(self._manifolds))
