"""Pallas remote-DMA halo exchange (ICI RDMA variant of parallel/halo.py).

The collective halo (`halo.shard_hist`, ppermute) routes through XLA's
collective machinery; this variant moves the same filter-history tail with
a hand-rolled Pallas kernel using `pltpu.make_async_remote_copy` — the
inter-chip RDMA primitive — so on a real slice the halo can overlap with
compute and skip collective-fusion scheduling entirely (SURVEY §5 comm-
backend plan; the carried liquid filter state it replaces lives at
src/sdr_pmr446.c:425-465).

Shape of the exchange: every device sends the LAST `hist_len` samples of
its shard to its RIGHT neighbor along the sharded axis (a ring shift);
shard 0 instead uses the cross-block carried history.  The cross-block
carry (last shard's tail, broadcast) stays a tiny psum — it is O(hist)
once per block and not worth an RDMA.

Validated on the virtual CPU mesh via the Pallas TPU interpreter
(`pltpu.InterpretParams`, which simulates inter-device DMA + semaphores,
with race detection available) against the ppermute version —
tests/test_halo_dma.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_shift_kernel(axis_name, tail_ref, out_ref, send_sem, recv_sem):
    my = jax.lax.axis_index(axis_name)
    num = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my + 1, num)
    left = jax.lax.rem(my + num - 1, num)

    # DeviceIdType.MESH with a {axis: index} dict addresses the neighbor
    # along the named mesh axis, keeping the other axes' coordinates
    mesh_id = pltpu.DeviceIdType.MESH

    # neighbor barrier: both neighbors must have entered the kernel (their
    # receive buffers exist) before anyone starts an RDMA into them
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id={axis_name: left},
                           device_id_type=mesh_id)
    pltpu.semaphore_signal(barrier, inc=1, device_id={axis_name: right},
                           device_id_type=mesh_id)
    pltpu.semaphore_wait(barrier, 2)

    rdma = pltpu.make_async_remote_copy(
        src_ref=tail_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id={axis_name: right},
        device_id_type=mesh_id,
    )
    rdma.start()
    rdma.wait()


def ring_shift_right(tail: jax.Array, axis: str, mesh_axes=None,
                     interpret: bool = False, collective_id: int = 7):
    """Inside shard_map: returns the LEFT neighbor's `tail` (ring shift).

    tail: any-shape array (moved as raw bytes HBM->HBM, no tiling
    constraints); axis: the mesh axis to shift along.  mesh_axes is
    accepted for API stability but unused: MESH-type device ids address
    the neighbor along `axis` directly.
    """
    del mesh_axes
    if jnp.iscomplexobj(tail):
        # move complex payloads as stacked re/im f32 planes (one DMA):
        # neither the interpreter nor Mosaic DMA needs complex support
        planes = jnp.stack([jnp.real(tail), jnp.imag(tail)])
        recv = ring_shift_right(planes, axis, interpret=interpret,
                                collective_id=collective_id)
        return jax.lax.complex(recv[0], recv[1]).astype(tail.dtype)
    kernel = functools.partial(_ring_shift_kernel, axis)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(tail.shape, tail.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=(pltpu.InterpretParams(detect_races=True)
                   if interpret else False),
    )(tail)


def shard_hist_dma(carried_hist: jax.Array, x_shard: jax.Array,
                   hist_len: int, axis: str, mesh_axes=None,
                   interpret: bool = False, collective_id: int = 7):
    """Drop-in replacement for halo.shard_hist with RDMA transport.

    Returns (hist, new_carried) with identical semantics: hist = left
    neighbor's tail (carried history on shard 0), new_carried = LAST
    shard's tail broadcast to all shards.  Distinct concurrent uses in one
    program need distinct collective_ids (one DMA semaphore set each).
    """
    num = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    tail = x_shard[..., x_shard.shape[-1] - hist_len:]
    if num == 1:
        return carried_hist, tail
    received = ring_shift_right(tail, axis, mesh_axes, interpret=interpret,
                                collective_id=collective_id)
    hist = jnp.where(d == 0, carried_hist, received)
    new_carried = jax.lax.psum(
        jnp.where(d == num - 1, tail, jnp.zeros_like(tail)), axis)
    return hist, new_carried
