"""On-device neighbor sampling — the fully TPU-resident hot path.

The reference *must* sample on the host: DGL's NeighborSampler is C++ CPU
code and the NodeFlow it produces is then shipped to the GPU every batch
(reference: PaGraph/parallel/dataloader.py:118-124, examples/profile/
pa_gcn.py:71-88).  On TPU nothing forces that split: when the CSR structure
and the feature cache both fit in HBM, the whole epoch — shuffle, sample,
feature gather, forward/backward, optimizer — runs inside one compiled
function and **zero bytes cross the host link per step**.  This module is
that sampler; :mod:`pagraph_tpu.train.device_epoch` is the epoch loop.

Design notes (vs the host sampler in ``sampling/sampler.py``):

  * Same per-vertex policy: in-degree ``d == 0`` -> all slots masked;
    ``0 < d <= fanout`` -> take all ``d`` (exact); ``d > fanout`` -> uniform
    with replacement.  Statistically identical minibatches.
  * **No deduplication.**  ``jnp.unique`` has data-dependent output shape,
    and sort-based compaction costs more than it saves here: dedup shrinks
    layer 0 ~3x, but the only per-step costs that scale with layer width are
    an HBM feature gather and the first-layer matmul — both cheap compared
    with round-tripping the batch through the host.  Layer ``i`` is simply
    ``concat(layer i+1, sampled neighbors)``, so the prefix-subset invariant
    of :mod:`sampling.block` holds by construction and every produced
    :class:`MiniBatch` is bit-compatible with the host-sampled ones.
  * Layer shapes are exactly ``B * (fanout+1)^hop`` — static, no capacity
    calibration needed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import CSRGraph
from .block import Block, MiniBatch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceCSR:
    """HBM-resident in-neighbor CSR (int32 — XLA gathers are fastest on i32).

    ``ptr_pairs[v] = (indptr[v], deg[v])`` packs both per-vertex pointer
    lookups into ONE 8-byte row gather — the sampler's cost is HBM gather
    transactions, not bytes (CLAUDE.md "Gather ceiling"), so halving the
    pointer lookups cuts ~1/4 of them.  Filled by :meth:`with_pairs`
    (call once per epoch dispatch, OUTSIDE the per-step scan).
    """

    indptr: jax.Array    # int32 [N+1]
    indices: jax.Array   # int32 [E]
    ptr_pairs: Optional[jax.Array] = None   # int32 [N, 2] (start, deg)

    @property
    def num_nodes(self) -> int:
        return self.indptr.shape[0] - 1

    def with_pairs(self) -> "DeviceCSR":
        if self.ptr_pairs is not None:
            return self
        pairs = jnp.stack(
            [self.indptr[:-1], self.indptr[1:] - self.indptr[:-1]], axis=1)
        return dataclasses.replace(self, ptr_pairs=pairs)

    @classmethod
    def from_graph(cls, graph: CSRGraph,
                   device: Optional[jax.Device] = None) -> "DeviceCSR":
        if graph.num_edges >= np.iinfo(np.int32).max:
            raise ValueError(
                f"{graph.num_edges} edges overflow int32 indptr; "
                "on-device sampling requires < 2^31 edges per partition"
            )
        indptr32 = graph.indptr.astype(np.int32)
        indptr = jnp.asarray(indptr32)
        indices = jnp.asarray(graph.indices)        # already int32
        pairs = jnp.asarray(
            np.stack([indptr32[:-1], np.diff(indptr32)], axis=1))
        if device is not None:
            indptr = jax.device_put(indptr, device)
            indices = jax.device_put(indices, device)
            pairs = jax.device_put(pairs, device)
        return cls(indptr=indptr, indices=indices, ptr_pairs=pairs)

    def nbytes(self) -> int:
        n = 4 * (int(self.indptr.shape[0]) + int(self.indices.shape[0]))
        if self.ptr_pairs is not None:
            n += 4 * self.ptr_pairs.size
        return n


def _vertex_ptrs(
    csr: DeviceCSR,
    dst: jax.Array,
    prefix: Optional[tuple[jax.Array, jax.Array]] = None,
) -> tuple[jax.Array, jax.Array]:
    """Fetch ``(start, deg)`` per dst vertex — one 8 B gather each.

    ``prefix`` supplies already-fetched pointers for the leading entries of
    ``dst`` (the sampler's layers are prefix-subsets, so hop ``h+1``'s dst
    begins with hop ``h``'s dst, whose pointers were fetched last hop —
    re-gathering them would waste HBM transactions, the sampler's bound).
    """
    if prefix is not None:
        ps, pd = prefix
        rest = dst[ps.shape[0]:]
    else:
        rest = dst
    if csr.ptr_pairs is not None:
        pairs = jnp.take(csr.ptr_pairs, rest, axis=0)    # one 8 B row each
        starts, deg = pairs[:, 0], pairs[:, 1]
    else:
        starts = jnp.take(csr.indptr, rest)
        deg = jnp.take(csr.indptr, rest + 1) - starts
    if prefix is not None:
        starts = jnp.concatenate([ps, starts])
        deg = jnp.concatenate([pd, deg])
    return starts, deg


def sample_hop(
    csr: DeviceCSR,
    dst: jax.Array,        # int32 [n] vertex ids
    dst_mask: jax.Array,   # bool  [n]
    fanout: int,
    key: jax.Array,
    *,
    paired: bool = False,
    ptrs: Optional[tuple[jax.Array, jax.Array]] = None,
) -> tuple[jax.Array, jax.Array]:
    """Sample ``fanout`` in-neighbors per dst vertex, inside jit.

    Returns ``(nbr int32 [n, fanout], mask bool [n, fanout])``; masked slots
    hold vertex 0 (excluded from aggregation by the mask).  Mirrors the host
    sampler's ``_sample_fanout`` policy exactly — except with
    ``paired=True``, the low-transaction window path: ONE random 8-aligned
    window of the adjacency list (a 32-byte ``dynamic_slice``) serves up to
    8 fanout slots, so a fanout-5 hop costs one index gather per vertex
    instead of five (the sampler is HBM-transaction-bound, CLAUDE.md
    "Gather ceiling"; this generalizes the earlier aligned-PAIR draws —
    at fanout 2 it draws bit-identical neighbors).  Slot ``j`` takes window
    element ``(o&7)^j`` where ``o`` is the vertex's uniform draw; XOR is an
    involution on the window, so when the candidate falls beyond ``deg`` the
    fallback to element ``o`` itself EXACTLY restores the missing mass —
    per-slot marginals are exactly uniform over [0, deg) for every degree.
    Slots within one window are correlated (sampled without replacement
    from one aligned window; distinct windows stay independent), consistent
    with with-replacement semantics the way the pair scheme was.  Take-all
    vertices (deg <= fanout) return exactly the generic path's result.
    """
    n = dst.shape[0]
    starts, deg = ptrs if ptrs is not None else _vertex_ptrs(csr, dst)
    safe = jnp.maximum(deg, 1)

    W = 8
    if paired and fanout >= 2 and csr.indices.shape[0] >= W:
        # ceil(fanout/8) independent aligned windows; take-all pins window
        # w's draw to base 8w, reproducing the generic path's valid slots
        # exactly (masked slots are zeroed either way).  Graphs with < 8
        # edges fall through to the generic path (dynamic_slice needs W).
        nwin = -(-fanout // W)
        e = csr.indices.shape[0]
        small = deg[:, None] <= fanout
        draws = jax.random.randint(key, (n, nwin), 0, jnp.int32(2**31 - 1),
                                   dtype=jnp.int32)
        o = draws % safe[:, None]                           # [n, nwin]
        wbase = (W * jnp.arange(nwin, dtype=jnp.int32))[None, :]
        o = jnp.where(small, wbase, o)
        cs = jnp.clip(starts[:, None] + (o & ~(W - 1)), 0, e - W)
        win = jax.vmap(
            lambda i: jax.lax.dynamic_slice(csr.indices, (i,), (W,))
        )(cs.ravel()).reshape(n, nwin, W)
        j = np.arange(fanout)
        wj, jj = j // W, jnp.asarray(j % W, dtype=jnp.int32)
        ow = o[:, wj]                                       # [n, fanout]
        cand = (ow & ~(W - 1)) | ((ow & (W - 1)) ^ jj[None, :])
        pos = jnp.where(cand < deg[:, None], cand, ow)
        # lane of element pos inside its fetched window; for deg==0 rows
        # this can land outside [0, W) — the one-hot select then yields 0,
        # and the slot is masked anyway
        lane = (starts[:, None] + pos) - cs[:, wj]
        lanes = jnp.arange(W, dtype=jnp.int32)
        nbr = jnp.sum(
            jnp.where(lane[..., None] == lanes, win[:, wj, :], 0), axis=-1)
        k = jnp.arange(fanout, dtype=jnp.int32)[None, :]
        mask = jnp.where(small, k < deg[:, None], (deg > 0)[:, None])
        mask = jnp.logical_and(mask, dst_mask[:, None])
        return jnp.where(mask, nbr, 0), mask

    k = jnp.arange(fanout, dtype=jnp.int32)[None, :]
    draws = jax.random.randint(key, (n, fanout), 0, jnp.int32(2**31 - 1),
                               dtype=jnp.int32)
    small = deg[:, None] <= fanout
    offs = jnp.where(small, k % safe[:, None], draws % safe[:, None])
    mask = jnp.where(small, k < deg[:, None], (deg > 0)[:, None])
    mask = jnp.logical_and(mask, dst_mask[:, None])
    nbr = jnp.take(csr.indices, starts[:, None] + offs)
    return jnp.where(mask, nbr, 0), mask


def sample_minibatch_device(
    csr: DeviceCSR,
    seeds: jax.Array,       # int32 [B] vertex ids (padded slots -> any valid id)
    seed_mask: jax.Array,   # bool  [B]
    num_hops: int,
    fanout,                 # int, or per-hop sequence ([0] = from the seeds)
    key: jax.Array,
    labels: Optional[jax.Array] = None,   # int32 [N] per-vertex labels
    paired: bool = False,
) -> MiniBatch:
    """Expand ``seeds`` into a padded :class:`MiniBatch`, fully on device.

    Layer ``i`` = ``concat(layer i+1 ids, layer i+1's sampled neighbors)``,
    so layer widths are ``B * prod(fanout_h + 1)`` over the inner hops and
    the inner layer is a prefix of the outer one (the invariant every model
    relies on).
    """
    fanouts = (tuple(fanout) if isinstance(fanout, (tuple, list))
               else (int(fanout),) * num_hops)
    assert len(fanouts) == num_hops, (fanouts, num_hops)
    keys = jax.random.split(key, num_hops)
    layers = [(seeds.astype(jnp.int32), seed_mask)]
    blocks_rev = []
    cur, curm = layers[0]
    ptrs = None
    for hop in range(num_hops):
        f = fanouts[hop]
        # hop h's dst is a prefix of hop h+1's dst: reuse fetched pointers
        ptrs = _vertex_ptrs(csr, cur, prefix=ptrs)
        nbr, emask = sample_hop(csr, cur, curm, f, keys[hop],
                                paired=paired, ptrs=ptrs)
        n = cur.shape[0]
        blocks_rev.append(Block(
            neigh_pos=(n + jnp.arange(n * f, dtype=jnp.int32)
                       ).reshape(n, f),
            neigh_mask=emask,
            self_pos=jnp.arange(n, dtype=jnp.int32),
            prefix_layout=True,
        ))
        cur = jnp.concatenate([cur, nbr.reshape(-1)])
        curm = jnp.concatenate([curm, emask.reshape(-1)])
        layers.append((cur, curm))
    layers.reverse()
    lab = (jnp.take(labels, seeds) if labels is not None
           else jnp.zeros(seeds.shape, jnp.int32))
    return MiniBatch(
        layer_nids=tuple(ids for ids, _ in layers),
        layer_mask=tuple(m for _, m in layers),
        blocks=tuple(reversed(blocks_rev)),
        labels=lab,
    )
