"""Neighbor sampling on the host CPU.

TPU-native analog of DGL's multi-threaded C++ ``NeighborSampler``
(reference: examples/profile/pa_gcn.py:71-76, PaGraph/parallel/
dataloader.py:118-124).  Fixed fan-out with per-edge validity masks keeps
every produced :class:`MiniBatch` statically shaped.

Sampling policy per destination vertex with in-degree ``d``:
  * ``d == 0``            -> all ``fanout`` slots masked out;
  * ``0 < d <= fanout``   -> take all ``d`` in-neighbors (exact, no bias);
  * ``d > fanout``        -> ``fanout`` uniform draws **with replacement**
    (unbiased for the mean aggregator; one vectorized modulo draw instead of
    per-vertex reservoir state).

Two backends: the pure-numpy implementation below (reference semantics,
always available) and the C++/OpenMP kernel in ``native/`` dispatched via
``pagraph_tpu.sampling.native`` for the hot path.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from ..config import SamplerConfig
from ..graph import CSRGraph
from .block import Block, MiniBatch, pad_1d, validity_mask


def _sample_fanout(
    graph: CSRGraph, dst: np.ndarray, fanout: int, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """Sample ``fanout`` in-neighbors per dst vertex.

    Returns ``(nbr_ids int64 [n, fanout], mask bool [n, fanout])``.
    Fully vectorized: one RNG draw, one modulo, one gather.
    """
    n = len(dst)
    starts = graph.indptr[dst]                      # int64 [n]
    deg = (graph.indptr[dst + 1] - starts).astype(np.int64)
    safe_deg = np.maximum(deg, 1)
    k = np.arange(fanout, dtype=np.int64)[None, :]  # [1, fanout]
    small = deg[:, None] <= fanout                  # take-all regime
    draws = rng.integers(0, np.iinfo(np.int64).max, size=(n, fanout))
    offs = np.where(small, k % safe_deg[:, None], draws % safe_deg[:, None])
    nbr = graph.indices[starts[:, None] + offs].astype(np.int64)
    mask = np.where(small, k < deg[:, None], deg[:, None] > 0)
    return nbr, mask


def sample_minibatch(
    graph: CSRGraph,
    seeds: np.ndarray,
    config: SamplerConfig,
    caps: Sequence[int],
    rng: np.random.Generator,
    labels: Optional[np.ndarray] = None,
) -> MiniBatch:
    """Expand ``seeds`` by ``config.num_hops`` levels into a padded MiniBatch.

    ``caps[i]`` is the static capacity of layer i (0 = outermost); see
    ``SamplerConfig.layer_capacities``.  If a layer's deduplicated vertex set
    exceeds its capacity, overflowing sampled vertices are dropped and their
    edges masked (a bounded-bias safety valve — never triggers with
    ``cap_factor=1``).
    """
    L = config.num_hops
    assert len(caps) == L + 1, (len(caps), L)
    fanouts = config.hop_fanouts()
    seeds = np.asarray(seeds, dtype=np.int64)
    if len(seeds) > caps[-1]:
        raise ValueError(f"{len(seeds)} seeds exceed seed capacity {caps[-1]}")

    # Build from seeds outward: cur holds layer i+1's actual (unpadded) ids.
    layer_ids = [seeds]            # will be reversed at the end
    blocks_rev = []
    cur = seeds
    for hop in range(L):
        cap_src = caps[L - hop - 1]
        nbr, mask = _sample_fanout(graph, cur, fanouts[hop], rng)
        # Deduplicate [cur ; sampled] preserving first-occurrence order so the
        # dst set occupies the prefix of the src layer (subset invariant).
        cand = np.concatenate([cur, nbr.ravel()])
        uniq_sorted, first_idx, inv_sorted = np.unique(
            cand, return_index=True, return_inverse=True
        )
        order = np.argsort(first_idx, kind="stable")
        rank_of_sorted = np.empty_like(order)
        rank_of_sorted[order] = np.arange(len(order))
        pos = rank_of_sorted[inv_sorted]            # first-occurrence position
        nxt = uniq_sorted[order]
        if len(nxt) > cap_src:
            # Overflow: keep the first cap_src first-occurrences (the dst set
            # is a prefix, so it always survives); mask edges to dropped ids.
            nxt = nxt[:cap_src]
            overflow = pos >= cap_src
            pos = np.where(overflow, 0, pos)
            mask &= ~overflow[len(cur):].reshape(mask.shape)
        self_pos = pos[: len(cur)].astype(np.int32)
        neigh_pos = pos[len(cur):].reshape(len(cur), fanouts[hop]).astype(np.int32)
        neigh_pos = np.where(mask, neigh_pos, 0).astype(np.int32)
        cap_dst = caps[L - hop]
        blocks_rev.append(
            Block(
                neigh_pos=_pad_rows(neigh_pos, cap_dst),
                neigh_mask=_pad_rows(mask, cap_dst),
                self_pos=pad_1d(self_pos, cap_dst),
            )
        )
        layer_ids.append(nxt)
        cur = nxt

    layer_ids.reverse()            # index 0 = outermost
    blocks = tuple(reversed(blocks_rev))
    layer_nids = tuple(
        pad_1d(ids.astype(np.int32), caps[i]) for i, ids in enumerate(layer_ids)
    )
    layer_mask = tuple(
        validity_mask(len(ids), caps[i]) for i, ids in enumerate(layer_ids)
    )
    if labels is not None:
        lab = pad_1d(labels[seeds].astype(np.int32), caps[-1])
    else:
        lab = np.zeros(caps[-1], dtype=np.int32)
    return MiniBatch(
        layer_nids=layer_nids, layer_mask=layer_mask, blocks=blocks, labels=lab
    )


def _pad_rows(arr: np.ndarray, cap: int) -> np.ndarray:
    if arr.shape[0] > cap:
        raise ValueError(f"{arr.shape[0]} rows exceed capacity {cap}")
    out = np.zeros((cap,) + arr.shape[1:], dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


class NeighborSampler:
    """Iterator over an epoch of shuffled minibatches.

    Mirrors the reference trainer's per-epoch ``NeighborSampler(...)``
    construction (pa_gcn.py:68-76): shuffle train vertices, chunk into
    batches, expand each into a padded MiniBatch.
    """

    def __init__(
        self,
        graph: CSRGraph,
        train_nids: np.ndarray,
        config: SamplerConfig,
        labels: Optional[np.ndarray] = None,
        shuffle: bool = True,
        seed: Optional[int] = None,
        backend: Optional[str] = None,
        caps: Optional[Sequence[int]] = None,
    ):
        self.graph = graph
        self.train_nids = np.asarray(train_nids, dtype=np.int64)
        self.config = config
        self.labels = labels
        self.shuffle = shuffle
        self.caps = tuple(caps) if caps is not None else config.layer_capacities(graph.num_nodes)
        self.rng = np.random.default_rng(config.seed if seed is None else seed)
        backend = backend or config.backend
        self._native = None
        if backend in ("auto", "native"):
            try:
                from . import native as _native_mod
                self._native = _native_mod.NativeSampler(graph, config, self.caps)
            except Exception:
                if backend == "native":
                    raise
                self._native = None

    @property
    def num_batches(self) -> int:
        b = self.config.batch_size
        return (len(self.train_nids) + b - 1) // b

    def calibrate_caps(self, probes: int = 8, slack: float = 1.2,
                       pad: int = 256) -> tuple:
        """Shrink layer capacities from the worst case to observed occupancy.

        Worst-case caps (batch * (fanout+1)^hop) are hugely pessimistic on
        real graphs because deduplication collapses shared neighbors (e.g.
        34% occupancy on RMAT-20 at fanout 2).  Probing a few batches and
        sizing to max*slack (rounded up to ``pad``) shrinks every device
        buffer, H2D transfer and kernel proportionally.  Rare overflow later
        is handled by the sampler's edge-masking safety valve.
        """
        rng = np.random.default_rng(0xC0FFEE ^ self.config.seed)
        maxes = np.zeros(len(self.caps), dtype=np.int64)
        n = len(self.train_nids)
        for _ in range(probes):
            seeds = self.train_nids[
                rng.choice(n, size=min(self.config.batch_size, n),
                           replace=False)
            ]
            mb = self.sample(seeds)
            sizes = [int(np.asarray(m).sum()) for m in mb.layer_mask]
            maxes = np.maximum(maxes, sizes)
        new_caps = []
        for i, (cap, mx) in enumerate(zip(self.caps, maxes)):
            c = min(int(mx * slack + pad - 1) // pad * pad, cap)
            new_caps.append(max(c, 1))
        new_caps[-1] = self.caps[-1]          # seed layer stays batch-sized
        self.set_caps(tuple(new_caps))
        return self.caps

    def set_caps(self, caps: tuple) -> None:
        self.caps = tuple(int(c) for c in caps)
        if self._native is not None:
            from . import native as _native_mod
            self._native = _native_mod.NativeSampler(
                self.graph, self.config, self.caps
            )

    def epoch(self) -> Iterator[MiniBatch]:
        order = (
            self.rng.permutation(len(self.train_nids))
            if self.shuffle
            else np.arange(len(self.train_nids))
        )
        nids = self.train_nids[order]
        b = self.config.batch_size
        for start in range(0, len(nids), b):
            seeds = nids[start : start + b]
            yield self.sample(seeds)

    def sample(self, seeds: np.ndarray) -> MiniBatch:
        if self._native is not None:
            return self._native.sample(
                seeds, self.labels, int(self.rng.integers(0, 2**31 - 1))
            )
        return sample_minibatch(
            self.graph, seeds, self.config, self.caps, self.rng, self.labels
        )

    def __iter__(self) -> Iterator[MiniBatch]:
        return self.epoch()
