"""Pallas TPU kernel: fused min-sum check-node scan.

The CN update's hot loop — per-check sign product + two smallest magnitudes
with the ``<=`` last-min-wins tie-break, then per-slot emission
(``decodeMinSum.cpp:410-450``) — on *pre-gathered* per-check message blocks
``[M, dc_max, B]``.  XLA executes the unrolled scan as several fused passes
over the block; this kernel performs scan + emission in a single VMEM pass
per tile (one read, one write).

Graph routing stays outside the kernel: Mosaic on this toolchain supports
neither arbitrary row gathers nor fast rolls (see CLAUDE.md / memory
notes), while XLA-level gathers/static rolls run at the memory roofline —
so the kernel covers exactly the arithmetic part of the op.

Bit-exact with decoders.minsum.minsum_cn_update on the same inputs
(comparisons and selects only — no reassociation), which the tests assert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["minsum_cn_scan_pallas"]


def _kernel(msgs_ref, mask_ref, out_ref, *, dc_max: int):
    inf = jnp.float32(jnp.inf)
    shape = msgs_ref.shape[0], msgs_ref.shape[2]  # (tile_m, tile_b)
    min1 = jnp.full(shape, inf, jnp.float32)
    min2 = jnp.full(shape, inf, jnp.float32)
    minidx = jnp.full(shape, -1, jnp.int32)
    sprod = jnp.ones(shape, jnp.float32)
    for t in range(dc_max):
        msg = msgs_ref[:, t, :]
        # mask is batch-invariant: stream it as [tile_m, dc_max] (not a
        # message-sized [tile_m, dc_max, tile_b] operand, which would double
        # the kernel's HBM traffic) and broadcast along lanes here.
        valid = mask_ref[:, t][:, None] > 0.5
        a = jnp.abs(msg)
        sign = jnp.where(msg >= 0, 1.0, -1.0)
        sprod = jnp.where(valid, sprod * sign, sprod)
        is_min = valid & (a <= min1)
        min2 = jnp.where(is_min, min1, jnp.where(valid & (a < min2), a, min2))
        minidx = jnp.where(is_min, t, minidx)
        min1 = jnp.where(is_min, a, min1)
    for t in range(dc_max):
        msg = msgs_ref[:, t, :]
        sign = jnp.where(msg >= 0, 1.0, -1.0)
        mag = jnp.where(minidx == t, min2, min1)
        valid = mask_ref[:, t][:, None] > 0.5
        out_ref[:, t, :] = jnp.where(valid, sprod * mag * sign, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_b"))
def minsum_cn_scan_pallas(
    msgs: jax.Array, mask: jax.Array, tile_m: int = 64, tile_b: int = 512
) -> jax.Array:
    """msgs: [M, dc_max, B] f32 gathered v2c; mask: [M, dc_max] bool.

    Returns c2v [M, dc_max, B] (0 in masked slots).  M and B are padded to
    the tile sizes internally.
    """
    m, dc_max, b = msgs.shape
    mp = -(-m // tile_m) * tile_m
    bp = -(-b // tile_b) * tile_b
    msgs_p = jnp.zeros((mp, dc_max, bp), jnp.float32)
    msgs_p = msgs_p.at[:m, :, :b].set(msgs.astype(jnp.float32))
    mask_p = jnp.zeros((mp, dc_max), jnp.float32)
    mask_p = mask_p.at[:m, :].set(mask.astype(jnp.float32))
    grid = (mp // tile_m, bp // tile_b)
    out = pl.pallas_call(
        functools.partial(_kernel, dc_max=dc_max),
        out_shape=jax.ShapeDtypeStruct((mp, dc_max, bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, dc_max, tile_b),
                lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_m, dc_max),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, dc_max, tile_b),
            lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
    )(msgs_p, mask_p)
    return out[:m, :, :b]
