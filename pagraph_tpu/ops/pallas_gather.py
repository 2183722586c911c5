"""Pallas TPU kernels for the sparse hot path: row gather and fused
gather + segment reduction.

These are the kernels SURVEY.md §2.3 N3 calls for: the reference leans on
DGL's CUDA gather/SpMM; on TPU the same ops become explicit HBM->VMEM DMA
programs.  XLA's stock row gather materializes through dynamic-slice loops;
issuing one async DMA per row with a deep outstanding window hides HBM
latency and keeps the VPU free for the reduction.

All kernels have jnp fallbacks (ops.aggregate) selected by ``use_pallas``;
numerics are tested identical on the interpreter and on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_rows_kernel(ids_ref, src_ref, out_ref, sems):
    """One grid step gathers TILE rows: row r <- src[ids[base + r]].

    ids are scalar-prefetched (available before the body runs) so every DMA
    can be issued immediately; ``sems`` is a DMA semaphore per row, keeping
    TILE copies in flight at once.
    """
    tile = out_ref.shape[0]
    base = pl.program_id(0) * tile

    def issue(r, _):
        dma = pltpu.make_async_copy(
            src_ref.at[ids_ref[base + r]], out_ref.at[r], sems.at[r]
        )
        dma.start()
        return 0

    jax.lax.fori_loop(0, tile, issue, 0)

    def wait(r, _):
        pltpu.make_async_copy(
            src_ref.at[ids_ref[base + r]], out_ref.at[r], sems.at[r]
        ).wait()
        return 0

    jax.lax.fori_loop(0, tile, wait, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_rows_pallas(src: jax.Array, ids: jax.Array, *, tile: int = 256,
                       interpret: bool = False) -> jax.Array:
    """``src[ids]`` for 2-D float sources.  ``len(ids)`` must be a multiple
    of ``tile`` (pad ids with 0 and slice after, or pick tile to divide)."""
    n = ids.shape[0]
    d = src.shape[1]
    if n % tile:
        pad = tile - n % tile
        ids = jnp.concatenate([ids, jnp.zeros(pad, dtype=ids.dtype)])
    m = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tile,))],
    )
    out = pl.pallas_call(
        _gather_rows_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids.astype(jnp.int32), src)
    return out[:n]


def _gather_mean_kernel(pos_ref, cnt_ref, src_ref, out_ref, acc, sems):
    """Fused gather + masked mean over the fanout axis.

    Grid step = TILE destinations.  ``pos_ref`` is the scalar-prefetched
    [num_dst * fanout] neighbor position list (masked slots point at row 0
    and are excluded via ``cnt_ref`` scaling after a sum of *masked* rows —
    the host packs masked slots as position 0 with count excluded).
    ``cnt_ref`` holds 1/max(valid_count,1) per destination; masked slots
    contribute src rows that are zeroed by the per-slot scale in ``acc``.
    """
    tile = out_ref.shape[0]
    fanout = acc.shape[0] // tile
    base = pl.program_id(0) * tile * fanout

    def issue(i, _):
        pltpu.make_async_copy(
            src_ref.at[pos_ref[base + i]], acc.at[i], sems.at[i]
        ).start()
        return 0

    jax.lax.fori_loop(0, tile * fanout, issue, 0)

    def wait(i, _):
        pltpu.make_async_copy(
            src_ref.at[pos_ref[base + i]], acc.at[i], sems.at[i]
        ).wait()
        return 0

    jax.lax.fori_loop(0, tile * fanout, wait, 0)

    d = out_ref.shape[1]
    rows = acc[:].reshape(tile, fanout, d)
    dst_base = pl.program_id(0) * tile
    scale = cnt_ref[pl.ds(dst_base * fanout, tile * fanout)].reshape(
        tile, fanout, 1
    )
    out_ref[:] = jnp.sum(rows * scale, axis=1)


@functools.partial(jax.jit, static_argnames=("fanout", "tile", "interpret"))
def gather_mean_pallas(src: jax.Array, neigh_pos: jax.Array,
                       neigh_mask: jax.Array, *, fanout: int,
                       tile: int = 128, interpret: bool = False) -> jax.Array:
    """Masked mean over fixed fan-out neighbors, fused with the row gather.

    src: [S, D]; neigh_pos/int32 neigh_mask/bool: [N, fanout] -> out [N, D].
    """
    n, d = neigh_pos.shape[0], src.shape[1]
    if n % tile:
        pad = tile - n % tile
        neigh_pos = jnp.concatenate(
            [neigh_pos, jnp.zeros((pad, fanout), neigh_pos.dtype)])
        neigh_mask = jnp.concatenate(
            [neigh_mask, jnp.zeros((pad, fanout), neigh_mask.dtype)])
    m = neigh_pos.shape[0]
    count = jnp.maximum(jnp.sum(neigh_mask, axis=1, keepdims=True), 1)
    # per-slot scale: mask/count, flattened alongside positions
    scale = (neigh_mask.astype(src.dtype) / count.astype(src.dtype)).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (full)
            pl.BlockSpec(memory_space=pltpu.ANY),    # src rows in HBM
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i, pos: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile * fanout, d), src.dtype),
            pltpu.SemaphoreType.DMA((tile * fanout,)),
        ],
    )
    out = pl.pallas_call(
        _gather_mean_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(neigh_pos.reshape(-1).astype(jnp.int32), scale, src)
    return out[:n]
