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
    indices: jax.Array   # int32 [E] (8-aligned length when built by
    #                      from_graph / pad_indices; zero-padded tail)
    ptr_pairs: Optional[jax.Array] = None     # int32 [N, 2] (start, deg)
    indices_rows: Optional[jax.Array] = None  # int32 [E/8, 8] row view

    @property
    def num_nodes(self) -> int:
        return self.indptr.shape[0] - 1

    def with_pairs(self) -> "DeviceCSR":
        if self.ptr_pairs is not None:
            return self
        pairs = jnp.stack(
            [self.indptr[:-1], self.indptr[1:] - self.indptr[:-1]], axis=1)
        return dataclasses.replace(self, ptr_pairs=pairs)

    def with_rows(self) -> "DeviceCSR":
        """Materialize the ``[E/8, 8]`` row table the paired-draw fast path
        gathers from.  The reshape is a LAYOUT CHANGE on TPU — done here,
        once, outside any scan (an in-scan reshape re-tiles the 64 MB table
        every step: measured 14.7M -> 6.8M edges/s on the bench epoch).
        No-op if ``indices`` is not 8-aligned (paired falls back to the
        generic path then)."""
        if (self.indices_rows is not None
                or self.indices.shape[0] % _ROW_W != 0
                or self.indices.shape[0] == 0):
            return self
        rows = self.indices.reshape(-1, _ROW_W)
        return dataclasses.replace(self, indices_rows=rows)

    @classmethod
    def from_graph(cls, graph: CSRGraph,
                   device: Optional[jax.Device] = None, *,
                   paired: bool = False) -> "DeviceCSR":
        """``paired=True`` additionally materializes the ``[E/8, 8]`` row
        table FROM THE HOST (numpy reshape + device_put).  This matters:
        a device-side ``reshape`` (``with_rows``, whether eager or in-jit)
        gets a T(8,128)-tiled OUTPUT buffer — the 8-wide minor dim padded
        to 128 lanes, 16x the logical bytes (33.8 GB at rmat25's 0.53B
        edges, which OOMed the one-chip claim run) — while transferred
        ARGUMENTS keep the compact layout (probe 2026-08-20: device_put of
        s32[66M, 8] fits and gathers fine)."""
        if graph.num_edges >= np.iinfo(np.int32).max:
            raise ValueError(
                f"{graph.num_edges} edges overflow int32 indptr; "
                "on-device sampling requires < 2^31 edges per partition"
            )
        indptr32 = graph.indptr.astype(np.int32)
        indptr = jnp.asarray(indptr32)
        padded = pad_indices(graph.indices)
        indices = jnp.asarray(padded)
        pairs = jnp.asarray(
            np.stack([indptr32[:-1], np.diff(indptr32)], axis=1))
        rows = (jnp.asarray(padded.reshape(-1, _ROW_W))
                if paired and padded.shape[0] else None)
        if device is not None:
            indptr = jax.device_put(indptr, device)
            indices = jax.device_put(indices, device)
            pairs = jax.device_put(pairs, device)
            if rows is not None:
                rows = jax.device_put(rows, device)
        return cls(indptr=indptr, indices=indices, ptr_pairs=pairs,
                   indices_rows=rows)

    def nbytes(self) -> int:
        n = 4 * (int(self.indptr.shape[0]) + int(self.indices.shape[0]))
        if self.ptr_pairs is not None:
            n += 4 * self.ptr_pairs.size
        if self.indices_rows is not None:
            n += 4 * self.indices_rows.size
        return n


_ROW_W = 8     # aligned-window width (32 B rows) for the paired-draw gather


def pad_indices(indices: np.ndarray) -> np.ndarray:
    """Zero-pad a CSR ``indices`` vector to a multiple of ``_ROW_W``.

    The paired-draw fast path in :func:`sample_hop` serves up to 8 fanout
    slots from ONE 32-byte row gather of ``indices.reshape(-1, 8)`` — that
    reshape (and nothing else) needs the length 8-aligned.  Sampled
    positions are always ``< deg``, so the zero padding is never selected.
    """
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    pad = (-indices.shape[0]) % _ROW_W
    if pad:
        indices = np.concatenate([indices, np.zeros(pad, np.int32)])
    return indices


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
    sampler's ``_sample_fanout`` policy — except with ``paired=True``, the
    low-transaction ROW-GATHER path: the adjacency list is viewed as
    ``[E/8, 8]`` rows and each vertex draw fetches ONE absolute-aligned
    32-byte row (``jnp.take`` along axis 0 — XLA's fast row-gather form)
    that serves up to 8 fanout slots, so a fanout-5 hop costs one gather
    transaction per vertex instead of five (the sampler is HBM-transaction-
    bound, CLAUDE.md "Gather ceiling").  Measured on v5e 2026-08-19:
    170 us vs 490 us generic at n=18000/fanout=2; 209 vs 440 us at
    n=6144/fanout=5; the earlier ``vmap(dynamic_slice)`` window fetch was
    ~40x slower than this (20.9 ms) and the round-1 2-wide pair scheme
    measured 818 us — row gather is the only fast window fetch form.

    Distribution: let ``g = start + o`` with ``o`` uniform on [0, deg).
    Slot ``j`` takes absolute element ``cand = (g & ~7) | ((g & 7) ^ j)``
    if ``cand`` lies inside the vertex's list, else ``g`` itself.  For each
    slot the candidate map is an involution on absolute positions, so the
    fallback EXACTLY restores the mass of out-of-range candidates —
    per-slot marginals are exactly uniform over the neighbor list for every
    degree.  Slots served by one row are correlated (near-without-
    replacement within the aligned window); distinct windows (fanout > 8)
    use independent draws.  Unlike the generic path, ``deg <= fanout``
    vertices get uniform WITH-replacement draws rather than take-all (the
    valid-slot count, ``mask`` = ``k < deg``, is unchanged) — an estimator
    variance tradeoff documented here and opt-in via
    ``sampler.paired_draws``.
    """
    n = dst.shape[0]
    starts, deg = ptrs if ptrs is not None else _vertex_ptrs(csr, dst)
    safe = jnp.maximum(deg, 1)

    W = _ROW_W
    e = csr.indices.shape[0]
    if paired and fanout >= 2 and e >= W and e % W == 0:
        # (length not 8-aligned -> generic path; DeviceCSR.from_graph and
        # the dp/ici trainers pad via pad_indices so this is always taken)
        nrows = e // W
        rows = (csr.indices_rows if csr.indices_rows is not None
                else csr.indices.reshape(nrows, W))
        nwin = -(-fanout // W)
        draws = jax.random.randint(key, (n, nwin), 0, jnp.int32(2**31 - 1),
                                   dtype=jnp.int32)
        o = draws % safe[:, None]                # [n, nwin] offset in list
        g = starts[:, None] + o                  # absolute element index
        # deg==0 tail vertices have g == e; clamp the row (slot is masked)
        row = jnp.minimum(g >> 3, nrows - 1)
        win = jnp.take(rows, row, axis=0)        # [n, nwin, W]: 1 txn each
        j = np.arange(fanout)
        wj, jj = j // W, jnp.asarray(j % W, dtype=jnp.int32)
        gw = g[:, wj]                            # [n, fanout]
        cand = (gw & ~(W - 1)) | ((gw & (W - 1)) ^ jj[None, :])
        pos = cand - starts[:, None]
        okc = jnp.logical_and(pos >= 0, pos < deg[:, None])
        chosen = jnp.where(okc, cand, gw)
        lane = chosen & (W - 1)                  # same row as g by constr.
        lanes = jnp.arange(W, dtype=jnp.int32)
        nbr = jnp.sum(
            jnp.where(lane[..., None] == lanes, win[:, wj, :], 0), axis=-1)
        k = jnp.arange(fanout, dtype=jnp.int32)[None, :]
        mask = jnp.where(deg[:, None] <= fanout, k < deg[:, None],
                         (deg > 0)[:, None])
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
