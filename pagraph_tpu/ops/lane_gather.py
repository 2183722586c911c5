"""Lane-vectorized element gather from large flat int32 tables.

XLA:TPU lowers ``jnp.take(flat_1d, idx)`` for random scalar indices to a
scalar-granularity gather (~1 element per cycle-ish), which makes the
on-device sampler's indptr/indices lookups the dominant step cost (measured
~1 ms/step at the bench shape — half the whole train step).  The TPU memory
system moves 512-byte (128-lane x int32) rows natively, so the fast path is
to view the flat table as ``[R, 128]`` rows, row-gather (which XLA *does*
vectorize: one 512 B DMA per index), then select the lane on the VPU with a
one-hot reduce.  Mathematically identical to ``jnp.take``.

This is a TPU-native design point with no reference counterpart: the
reference's samplers are host C++ (reference: PaGraph/parallel/
dataloader.py:118-124 ships NodeFlows from DGL's CPU sampler).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LANES = 128


def pack_lanes(flat: np.ndarray) -> np.ndarray:
    """Pad a flat 1-D array to a multiple of 128 and reshape to [R, 128].

    Host-side, one-time (padding inside jit would copy the table per step).
    """
    flat = np.ascontiguousarray(flat)
    pad = (-len(flat)) % LANES
    if pad:
        flat = np.pad(flat, (0, pad))
    return flat.reshape(-1, LANES)


def lane_take(table2d: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``flat_table[idx]`` where ``table2d = pack_lanes(flat_table)``.

    ``idx`` may have any shape; values must be in-range for the original
    flat table (reads into the zero padding are safe but meaningless).
    """
    shape = idx.shape
    flat_idx = idx.reshape(-1)
    rows = jnp.take(table2d, flat_idx >> 7, axis=0)          # [n, 128] DMAs
    lane = (flat_idx & (LANES - 1))[:, None]
    onehot = lane == jnp.arange(LANES, dtype=lane.dtype)[None, :]
    vals = jnp.sum(jnp.where(onehot, rows, 0), axis=1)
    return vals.reshape(shape)
