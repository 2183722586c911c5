"""ICI-distributed feature store: batch features fetched chip-to-chip.

The TPU-first extension the reference cannot express (SURVEY.md §2.3 N5,
BASELINE.md configs #3-#4): instead of every chip caching hot vertices and
falling back to **host** DRAM on a miss, the full feature matrix is sharded
disjointly across the mesh's HBM, and each minibatch's input features are
gathered from their owner chips with a pair of ``all_to_all`` collectives
over ICI — orders of magnitude more bandwidth than the host link the
reference's miss path rides.

Protocol per batch (inside the compiled shard_map step):

  1. each chip p holds ``req[q, H]``: offsets (into q's shard) of the rows p
     needs from q (host-planned, bucketed to the static halo width H);
  2. ``all_to_all(req)``      — now p holds the requests addressed to p;
  3. ``rows = shard[reqs]``   — local HBM gather;
  4. ``all_to_all(rows)``     — p receives its requested rows from everyone;
  5. ``feats = rows.reshape(P*H, D)[slot]`` — scatter into batch order.

Because inner minibatch layers are prefix-subsets of layer 0 (the sampler's
subset invariant), only layer-0 features ever cross chips; all deeper
aggregation is chip-local.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..storage.cache import bucket_size


def shard_features(features: np.ndarray, num_shards: int
                   ) -> Tuple[np.ndarray, int]:
    """Disjoint CYCLIC sharding: ``owner(v) = v % P``, ``slot(v) = v // P``.
    Returns (stacked [P, shard_rows, D], shard_rows), zero-padded tail.

    Cyclic (round-robin) beats contiguous blocks on power-law graphs: hub
    vertices cluster in low ids (RMAT, degree-ordered relabelings), so
    ``v // shard_rows`` ownership lets one chip own most of a batch's
    layer-0 and overflow the static halo width (VERDICT r1: silent feature
    zeroing under skew).  ``v % P`` spreads consecutive — and therefore
    hub — ids across all chips at zero runtime cost."""
    n, d = features.shape
    shard_rows = -(-n // num_shards)
    padded = np.zeros((num_shards * shard_rows, d), dtype=features.dtype)
    padded[:n] = features
    # chip r, slot j  <-  vertex j*P + r
    return (np.ascontiguousarray(
        padded.reshape(shard_rows, num_shards, d).transpose(1, 0, 2)),
        shard_rows)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-planned exchange indices for one chip's batch."""

    req: jax.Array     # int32 [P, H] offsets into each owner's shard
    slot: jax.Array    # int32 [cap0] index into the received [P*H] rows
    valid: jax.Array   # bool  [cap0] requested (invalid rows read row 0)


class HaloPlanner:
    """Builds per-chip HaloPlans on the host (vectorized numpy)."""

    def __init__(self, num_shards: int, shard_rows: int, halo_width: int):
        self.num_shards = num_shards
        self.shard_rows = shard_rows
        self.halo_width = halo_width   # static H; requests beyond H dropped

    def plan(self, full_nids: np.ndarray, mask: np.ndarray) -> HaloPlan:
        """``full_nids``: FULL-graph ids of the chip's cap0 input vertices."""
        P, H = self.num_shards, self.halo_width
        nids = np.asarray(full_nids, dtype=np.int64)
        cap0 = len(nids)
        owner = (nids % P).astype(np.int32)          # cyclic (see
        offset = (nids // P).astype(np.int32)        # shard_features)
        owner = np.where(mask, owner, 0)
        req = np.zeros((P, H), dtype=np.int32)
        slot = np.zeros(cap0, dtype=np.int32)
        valid = np.asarray(mask, dtype=bool).copy()
        for q in range(P):
            sel = np.nonzero((owner == q) & mask)[0]
            take = sel[:H]                      # overflow beyond H dropped
            req[q, : len(take)] = offset[take]
            slot[take] = q * H + np.arange(len(take), dtype=np.int32)
            if len(sel) > H:
                valid[sel[H:]] = False
        return HaloPlan(req=req, slot=slot, valid=valid)

    def max_needed_width(self, cap0: int) -> int:
        """A safe static H: a chip can need at most cap0 rows from one owner."""
        return cap0


def halo_width_for(cap0: int, num_shards: int, slack: float = 1.5) -> int:
    """Heuristic static halo width: balanced batches touch ~cap0/P rows per
    owner; bucket it with slack (drops are masked — visible via HaloStats)."""
    w = int(slack * -(-cap0 // num_shards))
    return min(bucket_size(w, cap0), cap0)


def device_halo_plan(nids: jax.Array, mask: jax.Array, shard_rows: int,
                     num_shards: int, halo_width: int) -> HaloPlan:
    """Build the exchange plan INSIDE jit (the on-device-sampling variant of
    ``HaloPlanner.plan``): group the batch's global vertex ids by owner chip
    and assign each a slot in its owner's static-width request column.
    Requests beyond ``halo_width`` per owner are dropped (masked to zero
    features — same accounting as the host planner)."""
    P, H = num_shards, halo_width
    # cyclic ownership (see shard_features); shard_rows kept in the
    # signature for the memory-accounting callers
    owner = jnp.where(mask, nids % P, P).astype(jnp.int32)
    offset = (nids // P).astype(jnp.int32)
    onehot = owner[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
    rank = (jnp.cumsum(onehot, axis=0) - 1)            # [cap0, P]
    rank = jnp.where(onehot, rank, 0).sum(axis=1).astype(jnp.int32)
    valid = jnp.logical_and(mask, rank < H)
    slot = jnp.where(valid, owner * H + rank, 0).astype(jnp.int32)
    req = jnp.zeros((P, H), dtype=jnp.int32).at[
        jnp.where(valid, owner, P), jnp.where(valid, rank, 0)
    ].set(offset, mode="drop")
    return HaloPlan(req=req, slot=slot, valid=valid)


def exchange_features(
    feat_shard: jax.Array,      # [shard_rows, D] this chip's slice
    plan: HaloPlan,             # leading-axis-free (per-chip) plan
    axis: str,
) -> jax.Array:
    """Run the two-collective exchange inside shard_map.
    Returns [cap0, D] batch features (invalid rows = 0)."""
    # 2. route requests to their owners: my row q -> chip q
    reqs_for_me = jax.lax.all_to_all(plan.req, axis, split_axis=0,
                                     concat_axis=0, tiled=True)  # [P*H]? no:
    # tiled=True splits axis0 across chips and concatenates received blocks:
    # result [P, H] where row p = requests chip p sent to me.
    reqs_for_me = reqs_for_me.reshape(plan.req.shape)
    # 3. serve: gather my shard rows for every requester
    rows = jnp.take(feat_shard, reqs_for_me.reshape(-1), axis=0)
    rows = rows.reshape(plan.req.shape[0], plan.req.shape[1], -1)  # [P, H, D]
    # 4. send each requester its rows back
    recv = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                              tiled=True)
    recv = recv.reshape(rows.shape)            # [P, H, D]: row q = from owner q
    # 5. batch order
    flat = recv.reshape(-1, recv.shape[-1])    # [P*H, D]
    feats = jnp.take(flat, plan.slot, axis=0)
    # zero literal in the shard's own dtype: a weak-typed 0.0 would promote
    # an int8 exchange result to f32 right after the 1-byte collective
    return jnp.where(plan.valid[:, None], feats,
                     jnp.zeros((), feats.dtype))
