"""Fixed-shape minibatch IR — the TPU-native replacement for DGL's NodeFlow.

The reference represents a sampled minibatch as a DGL NodeFlow: a C++ layered
bipartite graph with variable per-batch shapes, consumed by CUDA
``block_compute`` kernels (reference: PaGraph/model/gcn_nssc.py:71-74,
PaGraph/storage/storage.py:157-204).  Variable shapes would force an XLA
recompile per batch, so here a minibatch is a pytree of **statically shaped**
padded arrays; every batch of a given config reuses one compiled executable.

Structure (L = num_hops):

    layer 0 (outermost, largest) ... layer L (seeds)
    block i connects layer i (sources) -> layer i+1 (destinations)

Invariants:
  * ``layer_nids[i+1]`` is a prefix-subset of ``layer_nids[i]`` — every
    destination vertex also appears in its source layer (``include_self``),
    so input features are gathered once for layer 0 and every deeper
    representation is reachable via ``self_pos`` gathers.  (The reference's
    NodeFlow lacks this property, which is why its GraphSAGE recomputes
    aggregations at every remaining level per model layer,
    graphsage_nssc.py:92-131; our IR needs one block per model layer.)
  * ``neigh_pos[i][d, k]`` indexes a row of layer i; masked (padded) slots
    point at position 0 and are excluded by ``neigh_mask``.
  * All positions are **block-local** (indices into the layer arrays), so
    device code never touches global vertex ids; ``layer_nids`` keeps the
    local-partition vertex ids for the feature fetch.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Block:
    """One bipartite sampling level: sources (layer i) -> dests (layer i+1)."""

    neigh_pos: jax.Array    # int32 [cap_dst, fanout] positions into src layer
    neigh_mask: jax.Array   # bool  [cap_dst, fanout] valid sampled edge
    self_pos: jax.Array     # int32 [cap_dst] position of dst vertex in src layer
    # Static layout promise: self_pos == arange(cap_dst) and
    # neigh_pos == cap_dst + arange(cap_dst*fanout) (row-major).  The device
    # sampler produces exactly this (layer i = [layer i+1 | neighbors]), and
    # it turns every aggregation gather — and its backward scatter-add —
    # into a contiguous slice/pad: pure data movement XLA fuses, instead of
    # random-access HBM transactions (see CLAUDE.md "Gather ceiling").
    prefix_layout: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def cap_dst(self) -> int:
        return self.neigh_pos.shape[0]

    @property
    def fanout(self) -> int:
        return self.neigh_pos.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MiniBatch:
    """A sampled, padded, statically shaped training minibatch."""

    layer_nids: Tuple[jax.Array, ...]   # int32 [cap_i] local vertex ids (0-padded)
    layer_mask: Tuple[jax.Array, ...]   # bool  [cap_i] valid entries
    blocks: Tuple[Block, ...]           # len == num_hops
    labels: jax.Array                   # int32 [cap_seed]

    @property
    def num_hops(self) -> int:
        return len(self.blocks)

    @property
    def seed_mask(self) -> jax.Array:
        return self.layer_mask[-1]

    @property
    def input_nids(self) -> jax.Array:
        """Vertices whose features must be materialized (outermost layer)."""
        return self.layer_nids[0]

    @property
    def input_mask(self) -> jax.Array:
        return self.layer_mask[0]

    def num_valid(self, layer: int) -> jax.Array:
        return self.layer_mask[layer].sum()

    def num_sampled_edges(self) -> int:
        """Total valid sampled edges (host-side numpy batches only)."""
        return int(sum(np.asarray(b.neigh_mask).sum() for b in self.blocks))

    def num_loaded_vertices(self) -> int:
        """Total valid vertices across layers (host-side numpy batches only;
        the reference's count_vnum metric, examples/count_vnum.py:16-20).
        Single definition so all trainers' throughput accounting agrees."""
        return int(sum(np.asarray(m).sum() for m in self.layer_mask))


def pad_1d(arr: np.ndarray, cap: int, fill=0) -> np.ndarray:
    if len(arr) > cap:
        raise ValueError(f"array of length {len(arr)} exceeds capacity {cap}")
    out = np.full(cap, fill, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


def validity_mask(n: int, cap: int) -> np.ndarray:
    m = np.zeros(cap, dtype=bool)
    m[:n] = True
    return m
