"""Pallas RDMA ring primitives (SURVEY.md §5.8d): hand-tuned inter-chip
paths for the time-sharded solver's neighbor exchanges, built on
`pltpu.make_async_remote_copy` + DMA semaphores over ICI.

These are the optional hot-path twins of the XLA collectives used by
`parallel/time_shard.py` (ppermute halo exchange, all_gather of the SPIKE
boundary system) — every call site keeps the XLA fallback (§5.8's
(c)-level requirement), selected by a flag. Semantics are verified against
the XLA collectives on the 8-virtual-device CPU mesh via Pallas interpret
mode (which simulates the inter-device DMAs), the §5.2 sanitizer
discipline; on hardware the kernels lower to ICI RDMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(axis_name, shift, x_ref, out_ref, send_sem, recv_sem):
    my = jnp.int32(jax.lax.axis_index(axis_name))
    n = jnp.int32(jax.lax.psum(1, axis_name))
    dst = jax.lax.rem(my + jnp.int32(shift) + n, n)
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=dst,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def ring_shift(x, axis_name: str, shift: int = 1, interpret: bool = False,
               collective_id: int = 11):
    """RDMA ring twin of `jax.lax.ppermute(x, axis, [(i, (i+shift) % n)])`:
    every device receives its (i-shift)-th neighbor's `x`. Call inside a
    shard_map region over `axis_name`."""
    return pl.pallas_call(
        functools.partial(_shift_kernel, axis_name, shift),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(x)


def _all_gather_kernel(axis_name, x_ref, out_ref, send_sem, recv_sem):
    """Unidirectional ring all-gather (pallas_guide.md pattern): each step
    forwards the chunk received in the previous step to the right
    neighbor, using the output buffer itself as the communication buffer."""
    my = jnp.int32(jax.lax.axis_index(axis_name))
    n = jnp.int32(jax.lax.psum(1, axis_name))
    dst = jax.lax.rem(my + jnp.int32(1), n)

    # own chunk into its slot of the (replicated-layout) output
    out_ref[my] = x_ref[:]

    def step(s, _):
        # chunk originating at (my - s) is in out_ref[my - s]; send it on
        src_slot = jax.lax.rem(my - jnp.int32(s) + n, n)
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[src_slot],
            dst_ref=out_ref.at[src_slot],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        return 0

    jax.lax.fori_loop(0, n - 1, step, 0)


def ring_all_gather(x, axis_name: str, n_devices: int,
                    interpret: bool = False, collective_id: int = 12):
    """RDMA ring twin of `jax.lax.all_gather(x, axis)` (tiled=False):
    returns (n_devices, *x.shape). n_devices must equal the axis size
    (static for shapes)."""
    return pl.pallas_call(
        functools.partial(_all_gather_kernel, axis_name),
        out_shape=jax.ShapeDtypeStruct((n_devices,) + x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(x)
