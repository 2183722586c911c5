"""HBM-resident static feature cache with degree ranking.

TPU-native re-design of the reference's ``GraphCacheServer``
(reference: PaGraph/storage/storage.py:18-227).  Differences forced (and
enabled) by the XLA model:

  * The reference mutates NodeFlow frames in place per layer; here the cache
    is a read-only device array ``[capacity, total_dim]`` and batch assembly
    is a **functional** jitted gather-select (``assemble_features``) — one
    gather from HBM cache, one from the freshly transferred miss rows.
  * The hit/miss split runs on the host in vectorized numpy while the
    previous step computes on device (the loader overlaps them), producing a
    ``FetchPlan`` of statically bucketed shapes so XLA never recompiles.
  * Capacity auto-sizing keeps the reference's policy: fill whatever HBM
    remains after a warm-up step, ranked by **local out-degree**
    (storage.py:77-104); on TPU array sizes are static so the budget can also
    be computed ahead of time.

Only the outermost minibatch layer is fetched: deeper layers are
prefix-subsets (see sampling/block.py), so slicing the layer-0 features covers
every layer — the reference must fetch per NodeFlow layer instead
(storage.py:157-204).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import CSRGraph
from .feature_store import FeatureStore


def compute_dequant_scale(store: FeatureStore, field_names: Sequence[str],
                          chunk: int = 1 << 20) -> np.ndarray:
    """Per-column symmetric int8 scale over the FULL store: ``maxabs/127``
    per fused column (zero-variance columns get scale 1 so they quantize to
    exact 0).  One sequential chunked pass — memmap-friendly, so it works at
    store sizes that dwarf RAM.  The scale is store-wide (not cache-subset)
    so cached rows and miss rows dequantize identically.

    Pre-quantized stores (int8 fields with stored scales) short-circuit to
    the store's own fused scale — no pass over the data."""
    if store.is_quantized(field_names):
        return store.fused_scale(field_names)
    maxabs = np.zeros(store.total_dim(field_names), dtype=np.float32)
    offs = store.field_offsets(field_names)
    for name in field_names:
        f = store.fields[name]
        sl = offs[name]
        for at in range(0, f.shape[0], chunk):
            m = np.max(np.abs(f[at:at + chunk].astype(np.float32)), axis=0)
            np.maximum(maxabs[sl], m, out=maxabs[sl])
    scale = maxabs / 127.0
    scale[scale == 0.0] = 1.0
    return scale


def quantize_rows(rows: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """f32 rows -> int8 with the per-column ``scale`` (round-to-nearest,
    clipped to [-127, 127]; -128 unused to keep the scheme symmetric)."""
    q = np.rint(np.asarray(rows, dtype=np.float32) / scale[None, :])
    return np.clip(q, -127, 127).astype(np.int8)


def dequantize_fused(fused: jax.Array,
                     scale: Optional[np.ndarray] = None) -> jax.Array:
    """Jit-side fused-row promotion to f32.  For the int8 tier ``scale`` is
    the per-column dequant vector (length == fused width, possibly lane-
    padded with 1s); for f32/bf16 tiers it is None and this is a plain cast.
    XLA fuses the multiply into the gather's consumer, so the int8 tier pays
    no extra memory pass."""
    f = fused.astype(jnp.float32)
    if scale is not None:
        f = f * jnp.asarray(scale, dtype=jnp.float32)[None, :]
    return f


def bucket_size(n: int, cap: int, min_bucket: int = 512) -> int:
    """Round a miss count up to a power-of-two bucket (bounded recompiles)."""
    if n <= 0:
        return 0
    b = min_bucket
    while b < n:
        b *= 2
    return min(b, cap)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FetchPlan:
    """Host-computed per-batch cache plan (device-transferable pytree)."""

    hit_mask: jax.Array      # bool  [cap0] gather from cache
    cache_pos: jax.Array     # int32 [cap0] row in cache_values (0 if miss)
    miss_slot: jax.Array     # int32 [cap0] row in miss_feats   (0 if hit)
    miss_feats: jax.Array    # f32   [bucket, total_dim] gathered from host store


def assemble_features(cache_values: jax.Array, plan: FetchPlan) -> jax.Array:
    """Jit-side batch feature assembly -> [cap0, total_dim]."""
    hits = jnp.take(cache_values, plan.cache_pos, axis=0)
    if plan.miss_feats.shape[0] == 0:
        return hits
    misses = jnp.take(plan.miss_feats, plan.miss_slot, axis=0)
    return jnp.where(plan.hit_mask[:, None], hits, misses)


def assemble_features_from_map(
    cache_values: jax.Array,    # [capacity, total_dim]
    cache_map: jax.Array,       # int32 [num_local_nodes] row or -1
    nids: jax.Array,            # int32 [cap0] layer-0 local ids
    mask: jax.Array,            # bool  [cap0]
    miss_feats: jax.Array,      # f32   [bucket, total_dim]
) -> jax.Array:
    """Device-side hit/miss split: recomputes the FetchPlan inside jit from
    the HBM-resident residency map, so only ``miss_feats`` crosses the host
    link.  Miss ordering matches the host gather (first-occurrence order of
    valid misses — see FeatureCache.fetch_plan)."""
    pos = jnp.take(cache_map, nids, axis=0)
    hit = pos >= 0
    miss = jnp.logical_and(~hit, mask)
    hits = jnp.take(cache_values, jnp.where(hit, pos, 0), axis=0)
    if miss_feats.shape[0] == 0:
        return hits
    miss_slot = jnp.cumsum(miss.astype(jnp.int32)) - 1
    misses = jnp.take(miss_feats, jnp.clip(miss_slot, 0, None), axis=0)
    return jnp.where(hit[:, None], hits, misses)


class FeatureCache:
    """Per-device static cache over a partition's LOCAL vertex space."""

    def __init__(
        self,
        store: FeatureStore,
        field_names: Sequence[str],
        local_graph: CSRGraph,
        local2full: Optional[np.ndarray] = None,
        *,
        device: Optional[jax.Device] = None,
        dtype: str = "float32",
        pad_dim_to: int = 1,
    ):
        """``pad_dim_to``: round cache rows up to this many columns (128 =
        one TPU lane tile; measured +25% on-device gather throughput for the
        unaligned 100-dim bench workload).  Only valid for consumers that
        read ``cache_values`` directly (the on-device paths) — the hit/miss
        assembly paths expect unpadded ``total_dim`` rows."""
        import ml_dtypes
        if dtype == "bfloat16":
            self.np_dtype = np.dtype(ml_dtypes.bfloat16)
        elif dtype == "int8":
            self.np_dtype = np.dtype(np.int8)
        else:
            self.np_dtype = np.dtype(np.float32)
        self.store = store
        self.field_names = list(field_names)
        self.graph = local_graph
        self.local2full = (
            np.asarray(local2full, dtype=np.int64)
            if local2full is not None
            else np.arange(local_graph.num_nodes, dtype=np.int64)
        )
        self.device = device
        self.total_dim = store.total_dim(self.field_names)
        self.padded_dim = -(-self.total_dim // pad_dim_to) * pad_dim_to
        self.field_offsets = store.field_offsets(self.field_names)
        # int8 tier: store-wide per-column scale, computed ONCE at cache
        # construction (capacity-independent, so misses and cached rows share
        # it and step/epoch builders can close over it before fill())
        if self.np_dtype == np.int8:
            self.dequant_scale = compute_dequant_scale(store, self.field_names)
            self.dequant_scale_padded = np.pad(
                self.dequant_scale, (0, self.padded_dim - self.total_dim),
                constant_values=1.0)
        else:
            self.dequant_scale = None
            self.dequant_scale_padded = None
        n = local_graph.num_nodes
        # residency map: local id -> cache row, or -1
        self.cache_map = np.full(n, -1, dtype=np.int32)
        self.cache_values: Optional[jax.Array] = None
        self.capacity = 0
        self.fully_cached = False
        # miss-rate accounting (reference: storage.py:219-227); the lock
        # keeps counters exact under multi-threaded loaders
        self.try_num = 0
        self.miss_num = 0
        import threading
        self._stat_lock = threading.Lock()
        # per-vertex access frequency (for rank_by='access_freq' refills —
        # the reference's opt_cache_hit.py oracle, made an online policy)
        self.track_access = False
        self.access_counts = np.zeros(n, dtype=np.int64)

    # -- fill ---------------------------------------------------------------

    def rank_vertices(self, rank_by: str = "out_degree") -> np.ndarray:
        if rank_by == "out_degree":
            score = self.graph.out_degrees
        elif rank_by == "in_degree":
            score = self.graph.in_degrees
        elif rank_by == "access_freq":
            # observed access counts (fall back to out-degree before any
            # tracked epoch has run)
            score = (self.access_counts
                     if self.access_counts.any() else self.graph.out_degrees)
        else:
            raise ValueError(f"unknown rank_by {rank_by!r}")
        return np.argsort(-score, kind="stable")

    def auto_capacity(self, reserve_bytes: int = 1 << 30) -> int:
        """Vertices that fit in free HBM (reference: storage.py:77-88).

        Uses the cache's OWN row dtype: the bf16 tier's whole point is that
        2-byte rows cache twice the vertices in the same budget."""
        from ..utils.platform import free_hbm_bytes

        free = free_hbm_bytes(self.device, reserve=reserve_bytes)
        return int(free // (self.padded_dim * self.np_dtype.itemsize))

    def fill(self, capacity: Optional[int] = None, rank_by: str = "out_degree") -> None:
        """Size and populate the cache (reference ``auto_cache``,
        storage.py:70-104): cache everything if it fits, else the top-capacity
        vertices by local out-degree."""
        n = self.graph.num_nodes
        if capacity is None:
            capacity = self.auto_capacity()
        capacity = max(0, min(capacity, n))
        self.capacity = capacity
        self.fully_cached = capacity >= n
        if capacity == 0:
            self.cache_values = jnp.zeros(
                (1, self.padded_dim),
                dtype={1: jnp.int8, 2: jnp.bfloat16}.get(
                    self.np_dtype.itemsize, jnp.float32),
            )
            self.cache_map[:] = -1
            self._sync_map_dev()
            return
        if self.fully_cached:
            chosen = np.arange(n, dtype=np.int64)
        else:
            chosen = self.rank_vertices(rank_by)[:capacity].astype(np.int64)
        self.cache_map[:] = -1
        self.cache_map[chosen] = np.arange(len(chosen), dtype=np.int32)
        if self.np_dtype == np.int8 and self.store.is_quantized(self.field_names):
            host_rows = self.store.gather(
                self.field_names, self.local2full[chosen], quantized=True)
        else:
            host_rows = self.store.gather(self.field_names,
                                          self.local2full[chosen])
            if self.np_dtype == np.int8:
                host_rows = quantize_rows(host_rows, self.dequant_scale)
            elif host_rows.dtype != self.np_dtype:
                host_rows = host_rows.astype(self.np_dtype)
        if self.padded_dim > self.total_dim:
            host_rows = np.pad(
                host_rows, ((0, 0), (0, self.padded_dim - self.total_dim))
            )
        arr = jnp.asarray(host_rows)
        if self.device is not None:
            arr = jax.device_put(arr, self.device)
        self.cache_values = arr
        self._sync_map_dev()

    def _sync_map_dev(self) -> None:
        m = jnp.asarray(self.cache_map)
        self.cache_map_dev = (
            jax.device_put(m, self.device) if self.device is not None else m
        )

    # -- per-batch fetch ----------------------------------------------------

    def fetch_plan(
        self,
        input_nids: np.ndarray,     # int32 [cap0] LOCAL ids (padded)
        input_mask: np.ndarray,     # bool  [cap0]
        *,
        to_device: bool = False,
        track: bool = True,
    ) -> FetchPlan:
        """Host-side hit/miss split + miss gather (the loader runs this in a
        background thread; the device assembly happens inside the train step).
        Returns numpy arrays unless ``to_device``."""
        nids = np.asarray(input_nids)
        mask = np.asarray(input_mask)
        cap0 = len(nids)
        pos = self.cache_map[nids]
        hit = (pos >= 0) & mask
        miss = (~hit) & mask
        n_miss = int(miss.sum())
        if track:
            with self._stat_lock:
                self.try_num += int(mask.sum())
                self.miss_num += n_miss
                if self.track_access:
                    np.add.at(self.access_counts, nids[mask], 1)
        bucket = bucket_size(n_miss, cap0)
        miss_feats = np.zeros((bucket, self.total_dim), dtype=self.np_dtype)
        miss_slot = np.zeros(cap0, dtype=np.int32)
        if n_miss:
            miss_idx = np.nonzero(miss)[0]
            miss_slot[miss_idx] = np.arange(n_miss, dtype=np.int32)
            if self.np_dtype == np.float32:
                self.store.gather(
                    self.field_names,
                    self.local2full[nids[miss_idx]],
                    out=miss_feats[:n_miss],
                )
            elif self.np_dtype == np.int8:
                if self.store.is_quantized(self.field_names):
                    # pre-quantized tier: gather int8 rows straight into the
                    # transfer buffer (no f32 materialization, 4x fewer bytes
                    # read from DRAM)
                    self.store.gather(self.field_names,
                                      self.local2full[nids[miss_idx]],
                                      out=miss_feats[:n_miss], quantized=True)
                else:
                    miss_feats[:n_miss] = quantize_rows(
                        self.store.gather(self.field_names,
                                          self.local2full[nids[miss_idx]]),
                        self.dequant_scale,
                    )
            else:
                miss_feats[:n_miss] = self.store.gather(
                    self.field_names, self.local2full[nids[miss_idx]]
                )
        plan = FetchPlan(
            hit_mask=hit,
            cache_pos=np.where(hit, pos, 0).astype(np.int32),
            miss_slot=miss_slot,
            miss_feats=miss_feats,
        )
        if to_device:
            plan = jax.tree.map(
                lambda x: jax.device_put(x, self.device) if self.device else jnp.asarray(x),
                plan,
            )
        return plan

    # -- metrics ------------------------------------------------------------

    def miss_rate(self) -> float:
        return self.miss_num / self.try_num if self.try_num else 0.0

    def reset_stats(self) -> None:
        self.try_num = 0
        self.miss_num = 0
