"""Data-parallel trainer: one graph partition + HBM cache shard per chip.

The multi-chip analog of the reference's ``mp.spawn(trainer, nprocs=gpus)``
topology (reference: examples/profile/pa_gcn.py:117-157): instead of one
process per accelerator with NCCL, a single host process drives every chip
through stacked, dp-sharded batch pytrees and one compiled shard_map step.

Epoch-tail alignment: partitions can have different batch counts; shorter
partitions wrap around and resample (the reference's "make-up" sends,
parallel/dataloader.py:138-143) so every chip steps in lockstep.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import Config
from ..data.formats import Dataset, PartitionArtifact
from ..partition import dg_partition, hash_partition
from ..sampling.sampler import NeighborSampler
from ..storage.cache import FeatureCache
from ..storage.feature_store import FeatureStore
from ..train.loop import EpochMetrics
from ..train.state import create_state
from ..utils.timers import PhaseTimers
from .mesh import dp_sharding, make_mesh, replicated
from .multihost import (host_fold_key, is_multiprocess, local_dp_rows,
                        place_dp, place_replicated)
from .train_step import make_dp_train_step


class _ServiceRankView:
    """Per-chip view of a shared one2all SampleService (epoch_for(rank))."""

    def __init__(self, svc, rank: int):
        self._svc, self._rank = svc, rank

    @property
    def num_batches(self) -> int:
        return self._svc.num_batches

    def epoch(self):
        return self._svc.epoch_for(self._rank)


class DataParallelTrainer:
    def __init__(
        self,
        cfg: Config,
        store: FeatureStore,
        parts: Sequence[PartitionArtifact],
        *,
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        log: bool = False,
        feature_source: str = "cache",   # cache | ici | edge
        dispatch: str = "one2one",       # isolation-mode sampler dispatch:
                                         # one2one = a worker pool per chip
                                         # over ITS partition (pa_iso);
                                         # one2all = ONE pool over the full
                                         # graph round-robining every chip
                                         # (the reference's cache_server)
        full_graph=None,                 # needed for ici + on-device sampling
        full_train_nids: Optional[np.ndarray] = None,
        full_labels: Optional[np.ndarray] = None,
        full_val_mask: Optional[np.ndarray] = None,  # for train.eval_every
        full_features: Optional[np.ndarray] = None,  # RAW features (eval)
    ):
        self.cfg = cfg
        self.store = store
        self.parts = list(parts)
        self.mesh = mesh or make_mesh(len(self.parts))
        n_dev = self.mesh.devices.size
        if len(self.parts) != n_dev:
            raise ValueError(
                f"{len(self.parts)} partitions for {n_dev} mesh devices"
            )
        self.log = log
        self.feature_source = feature_source
        self.dispatch = dispatch
        if dispatch not in ("one2one", "one2all"):
            raise ValueError(f"unknown dispatch {dispatch!r}")
        if dispatch == "one2all" and not cfg.train.remote_sampling:
            raise ValueError(
                "dispatch='one2all' is an isolation-mode knob: set "
                "train.remote_sampling=True"
            )
        self._full_graph = full_graph
        self._full_train_nids = full_train_nids
        self._full_labels = full_labels
        self._full_val_mask = full_val_mask
        self._full_features = full_features
        if cfg.train.eval_every and (full_graph is None or full_labels is None
                                     or full_val_mask is None):
            raise ValueError(
                "cfg.train.eval_every needs full_graph/full_labels/"
                "full_val_mask (from_dataset wires them automatically)"
            )
        self._epoch_edges = 0
        self._epoch_vertices = 0

        field_names = ["features"]
        if cfg.model.arch == "graphsage" and cfg.model.preprocess:
            field_names.append("neigh")

        self._device_mode = cfg.train.on_device_sampling
        self._mp = is_multiprocess()
        if cfg.train.epoch_dispatch == "steps":
            raise NotImplementedError(
                "epoch_dispatch='steps' is a single-chip Trainer mode; the "
                "multi-chip epochs keep the whole-epoch shard_map dispatch "
                "(per-step dispatch would multiply the host dispatch count "
                "by num_batches on every chip)"
            )
        if feature_source == "edge" and not self._device_mode:
            raise NotImplementedError(
                "feature_source='edge' (partition CSR + ICI-sharded "
                "features) is an on-device mode: set "
                "train.on_device_sampling=True"
            )
        if cfg.train.halo_pipeline and feature_source != "edge":
            raise ValueError(
                "train.halo_pipeline pipelines the EDGE mode's halo "
                "exchange: set feature_source='edge' (it is a no-op "
                "everywhere else)"
            )
        if cfg.train.halo_pipeline and cfg.model.arch == "gcn_cv":
            raise NotImplementedError(
                "halo_pipeline is not implemented for the gcn_cv edge "
                "epoch (make_edge_cv_device_epoch_fn runs unpipelined; "
                "CV history reads would have to be pipelined with the "
                "batch too)"
            )
        if cfg.model.arch == "gcn_cv" and (not self._device_mode
                                           or feature_source == "ici"):
            raise NotImplementedError(
                "multi-chip gcn_cv needs device-resident per-partition "
                "histories: set train.on_device_sampling=True with "
                "feature_source='cache' or 'edge' (ici samples the FULL "
                "graph on every chip, so chips would write divergent "
                "histories for the same vertex; see the design note on "
                "train/device_epoch.make_edge_cv_device_epoch_fn)"
            )
        if self._device_mode and feature_source == "ici" and full_graph is None:
            raise ValueError(
                "on_device_sampling with feature_source='ici' samples the "
                "FULL graph on every chip: pass full_graph/full_train_nids/"
                "full_labels (from_dataset does this automatically)"
            )
        # Per-device samplers share layer capacities sized for the LARGEST
        # partition so the stacked pytrees are uniform.
        max_nodes = max(p.num_nodes for p in self.parts)
        self.caps = cfg.sampler.layer_capacities(max_nodes)
        iter_rows = (local_dp_rows(self.mesh) if self._mp
                     else list(range(len(self.parts))))
        if not self._device_mode:
            one2all = cfg.train.remote_sampling and dispatch == "one2all"
            if one2all:
                # the reference's cache_server topology: ONE sampler pool
                # over the FULL graph round-robins batches to every chip
                # with tail make-up sends (dataloader.py:113-147).  The
                # service emits FULL-graph vertex ids, so every partition
                # must be an identity full-graph view (from_dataset builds
                # them for this mode).
                from ..sampling.service import SampleService
                if full_graph is None:
                    raise ValueError("one2all needs full_graph/"
                                     "full_train_nids/full_labels")
                if any(p.num_nodes != full_graph.num_nodes
                       for p in self.parts):
                    raise ValueError(
                        "dispatch='one2all' samples FULL-graph vertex ids: "
                        "partitions must be identity full-graph views "
                        "(use from_dataset, which builds them)"
                    )
                if cfg.sampler.auto_caps:
                    probe = NeighborSampler(
                        full_graph, np.asarray(full_train_nids), cfg.sampler,
                        labels=full_labels, seed=seed, caps=self.caps)
                    self.caps = tuple(int(c) for c in probe.calibrate_caps())
                svc = SampleService(
                    full_graph, np.asarray(full_train_nids),
                    cfg.sampler, labels=full_labels, seed=seed,
                    caps=self.caps, num_consumers=len(self.parts),
                )
                self._one2all_service = svc
                self.samplers = {r: _ServiceRankView(svc, r)
                                 for r in range(len(self.parts))}
            else:
                self.samplers = {
                    r: NeighborSampler(
                        self.parts[r].graph, self.parts[r].train_nids,
                        cfg.sampler, labels=self.parts[r].labels,
                        seed=seed + 31 * r, caps=self.caps,
                    )
                    for r in range(len(self.parts))
                }
                if cfg.sampler.auto_caps:
                    # uniform caps across chips: elementwise max of per-chip
                    # probes over ALL partitions (multi-process: every
                    # process computes the identical value - caps are a
                    # cross-process layout contract)
                    probed = np.array([s.calibrate_caps()
                                       for s in self.samplers.values()])
                    self.caps = tuple(int(c) for c in probed.max(axis=0))
                    for s in self.samplers.values():
                        s.set_caps(self.caps)
            if cfg.train.remote_sampling and not one2all:
                # isolation mode at multi-chip scale (the reference's
                # pa_iso: one sampler-process pool per trainer,
                # examples/profile/pa_iso.py + dataloader.py:150-172):
                # replace each LOCAL row's in-process sampler with a
                # shared-memory slot-ring service; remote rows keep the
                # cheap probe objects (never iterated)
                from ..sampling.service import SampleService
                for r in iter_rows:
                    self.samplers[r] = SampleService(
                        self.parts[r].graph, self.parts[r].train_nids,
                        cfg.sampler, labels=self.parts[r].labels,
                        seed=seed + 31 * r, caps=self.caps,
                    )
        pad_dim = (128 if self._device_mode
                   and feature_source not in ("ici", "edge") else 1)
        self.caches = [
            FeatureCache(store, field_names, p.graph, p.local2full,
                         dtype=cfg.cache.dtype, pad_dim_to=pad_dim)
            for p in self.parts
        ]
        self.state, self._tx = create_state(cfg, seed=seed)
        self.state = place_replicated(self.state, self.mesh)
        self._dp = dp_sharding(self.mesh)
        self._cache_stacked: Optional[jax.Array] = None
        offsets = self.caches[0].field_offsets
        if self._device_mode and feature_source == "ici":
            self._init_ici_device_mode(offsets, seed, field_names)
        elif self._device_mode and feature_source == "edge":
            self._init_edge_device_mode(offsets, seed, field_names)
        elif self._device_mode:
            self._init_device_mode(offsets, seed)
        elif feature_source == "ici":
            from .train_step import make_dp_halo_train_step
            # shard first: _shard_full_features computes _exchange_scale
            self._init_ici_features(field_names)
            self.step_fn = make_dp_halo_train_step(
                cfg, self._tx, self.mesh,
                offsets["features"], offsets.get("neigh"),
                dequant_scale=self._exchange_scale,
            )
        else:
            self.step_fn = make_dp_train_step(
                cfg, self._tx, self.mesh, offsets,
                dequant_scale=self.caches[0].dequant_scale_padded)
        self.timers = PhaseTimers()
        self.epoch_metrics: List[EpochMetrics] = []
        # host-pipeline multi-process: this process samples/packs only the
        # partitions its local devices own
        self._local_rows = (local_dp_rows(self.mesh) if self._mp
                            else list(range(len(self.parts))))

    def _stack_partition_structure(self):
        """Stack per-partition CSR/train-ids/labels on the dp axis (shared
        by the dp-cache and edge device modes).  Returns (max_n, max_e,
        put) and sets the ``_dev_*`` structure buffers."""
        parts = self.parts
        D = len(parts)
        max_n = max(p.num_nodes for p in parts)
        # 8-aligned so the paired-draw row-gather path is available
        max_e = -(-max(p.graph.num_edges for p in parts) // 8) * 8
        max_t = max(len(p.train_nids) for p in parts)
        if max_e >= np.iinfo(np.int32).max:
            raise ValueError("partition edge count overflows int32")
        # Per-chip HBM is max_p(E_p), NOT E/P: padding to the largest
        # partition wastes (skew-1)*mean_e int32s per chip.  Surface the
        # skew so users see the waste (VERDICT r2 #4) — dg's hub-heavy
        # closures can skew badly; PartitionConfig.edge_balance=True
        # rebalances the assignment by edge footprint.
        e_parts = [p.graph.num_edges for p in parts]
        mean_e = max(float(np.mean(e_parts)), 1.0)
        self.structure_skew = float(max(e_parts)) / mean_e
        if self.structure_skew > 1.5:
            import warnings
            warnings.warn(
                f"partition edge skew max/mean = {self.structure_skew:.2f} "
                f"(edges/part {e_parts}): every chip pads its CSR to "
                f"{max_e} entries, wasting "
                f"{(self.structure_skew - 1) * mean_e * 4 / 1e6:.0f} MB "
                f"HBM per average chip. Partition with "
                f"edge_balance=True (cli: --edge-balance) to rebalance.",
                RuntimeWarning, stacklevel=4,
            )
        indptr = np.zeros((D, max_n + 1), dtype=np.int32)
        indices = np.zeros((D, max_e), dtype=np.int32)
        train_nids = np.zeros((D, max_t), dtype=np.int32)
        counts = np.zeros(D, dtype=np.int32)
        labels = np.zeros((D, max_n), dtype=np.int32)
        for r, p in enumerate(parts):
            g = p.graph
            # pad indptr with the final offset -> padded vertices have deg 0
            indptr[r, : g.num_nodes + 1] = g.indptr
            indptr[r, g.num_nodes + 1:] = g.num_edges
            indices[r, : g.num_edges] = g.indices
            counts[r] = len(p.train_nids)
            train_nids[r, : counts[r]] = p.train_nids
            labels[r, : len(p.labels)] = p.labels
        put = lambda x: place_dp(x, self.mesh)
        self._dev_indptr = put(indptr)
        self._dev_indices = put(indices)
        # narrow-minor-dim derived tables are built on the HOST and
        # transferred: a device-side stack/reshape output gets a
        # T(8,128)-tiled layout — minor dim 2 padded to 128 (64x) / 8 to
        # 128 (16x) — which OOMs real chips at scale (the rmat25 lesson,
        # DeviceCSR.from_graph docstring).  Arguments stay compact.
        pairs = np.stack([indptr[:, :-1], np.diff(indptr, axis=1)], axis=-1)
        self._dev_ptr_pairs = put(np.ascontiguousarray(pairs))
        if self.cfg.sampler.paired_draws:
            rows = indices.reshape(D, max_e // 8, 8)
        else:
            rows = np.zeros((D, 1, 8), dtype=np.int32)   # unused placeholder
        self._dev_rows = put(np.ascontiguousarray(rows))
        self._dev_train_nids = put(train_nids)
        self._dev_counts = put(counts)
        self._dev_labels = put(labels)
        B = self.cfg.sampler.batch_size
        self._dev_num_batches = int(max(-(-c // B) for c in counts))
        return max_n, max_e, put

    def _init_device_mode(self, offsets, seed) -> None:
        """Stack per-partition CSR/train-ids/labels on the dp axis and build
        the whole-epoch on-device step (train/device_epoch.py).  Each chip
        samples its own partition in HBM; nothing crosses the host link
        inside an epoch."""
        from ..train.device_epoch import make_dp_device_epoch_fn

        max_n, max_e, put = self._stack_partition_structure()
        self._is_cv = self.cfg.model.arch == "gcn_cv"
        if self._is_cv:
            self._init_dp_cv(offsets, max_n, max_e, put)
        else:
            self.epoch_fn = make_dp_device_epoch_fn(
                self.cfg, self._tx, self.mesh, offsets,
                self._dev_num_batches,
                dequant_scale=self.caches[0].dequant_scale_padded,
            )
        self._set_epoch_key(seed)

    def _init_edge_device_mode(self, offsets, seed, field_names) -> None:
        """EDGE-PARTITIONED mode (BASELINE configs #4/#5): per-chip
        partition CSR (E/P structure) + cyclically ICI-sharded features
        (N*dim/P rows), layer-0 rows fetched from owner chips inside the
        one-dispatch epoch (train/device_epoch.make_edge_device_epoch_fn;
        gcn_cv composes its local-space histories with the same exchange,
        make_edge_cv_device_epoch_fn).  Memory accounting is logged so
        per-chip HBM is auditable."""
        from ..train.device_epoch import (make_edge_cv_device_epoch_fn,
                                          make_edge_device_epoch_fn)

        max_n, max_e, put = self._stack_partition_structure()
        D = len(self.parts)
        l2f = np.zeros((D, max_n), dtype=np.int32)
        for r, p in enumerate(self.parts):
            if p.local2full.max(initial=0) >= np.iinfo(np.int32).max:
                raise ValueError("full vertex id overflows int32")
            l2f[r, : len(p.local2full)] = p.local2full
        self._dev_local2full = put(l2f)
        n, total_dim, stack_shape = self._shard_full_features(field_names)
        self._is_cv = self.cfg.model.arch == "gcn_cv"
        if self._is_cv:
            self._build_cv_state(max_n, max_e, put)
            self.epoch_fn = make_edge_cv_device_epoch_fn(
                self.cfg, self._tx, self.mesh, offsets,
                self._dev_num_batches, max_n, self._shard_rows,
                self._halo_width,
                dequant_scale=self._exchange_scale,
            )
        else:
            self.epoch_fn = make_edge_device_epoch_fn(
                self.cfg, self._tx, self.mesh, offsets,
                self._dev_num_batches, self._shard_rows, self._halo_width,
                dequant_scale=self._exchange_scale,
            )
        self._set_epoch_key(seed)
        self.halo_drops = 0
        if self.log:
            struct_mb = (self._dev_indptr.nbytes
                         + self._dev_indices.nbytes) / D / 1e6
            feat_mb = np.prod(stack_shape[1:]) * (
                {"bfloat16": 2, "int8": 1}.get(self.cfg.cache.dtype, 4)
            ) / 1e6
            print(f"[edge-device] per-chip structure {struct_mb:.1f} MB "
                  f"(max_e={max_e}, edge skew max/mean "
                  f"{self.structure_skew:.2f}), features {n} x {total_dim} "
                  f"sharded {stack_shape} ({feat_mb:.1f} MB/chip), halo "
                  f"width {self._halo_width}, "
                  f"{self._dev_num_batches} steps/chip")

    def _init_dp_cv(self, offsets, max_n: int, max_e: int, put) -> None:
        """Per-chip control-variate state + the dp-cache epoch builder
        (train/device_epoch.py make_dp_cv_device_epoch_fn)."""
        from ..train.device_epoch import make_dp_cv_device_epoch_fn

        self._build_cv_state(max_n, max_e, put)
        self.epoch_fn = make_dp_cv_device_epoch_fn(
            self.cfg, self._tx, self.mesh, offsets, self._dev_num_batches,
            max_n,
            dequant_scale=self.caches[0].dequant_scale_padded,
        )

    def _build_cv_state(self, max_n: int, max_e: int, put) -> None:
        """History/agg-history arrays over each partition's LOCAL vertex
        space, plus each chip's padded edge list for the end-of-epoch exact
        refresh — shared by the dp-cache and edge cv modes (histories are
        local state in both; only the feature source differs)."""
        from ..models.gcn_cv import layer_widths

        parts = self.parts
        D = len(parts)
        widths = layer_widths(self.cfg.model)
        self._dev_hists = tuple(
            put(np.zeros((D, max_n, w), np.float32)) for w in widths)
        self._dev_aggs = tuple(
            put(np.zeros((D, max_n, w), np.float32)) for w in widths)
        chunk = min(1 << 20, max(max_e, 1))
        padded_e = -(-max_e // chunk) * chunk
        ch = padded_e // chunk
        esrc = np.zeros((D, padded_e), np.int32)
        edst = np.full((D, padded_e), max_n, np.int32)   # sentinel: dropped
        invdeg = np.ones((D, max_n), np.float32)
        for r, p in enumerate(parts):
            g = p.graph
            e, n = g.num_edges, g.num_nodes
            esrc[r, :e] = g.indices
            edst[r, :e] = np.repeat(np.arange(n, dtype=np.int32),
                                    g.in_degrees.astype(np.int64))
            invdeg[r, :n] = (1.0 / np.maximum(g.in_degrees, 1)
                             ).astype(np.float32)
        self._dev_esrc = put(esrc.reshape(D, ch, chunk))
        self._dev_edst = put(edst.reshape(D, ch, chunk))
        self._dev_invdeg = put(invdeg)

    def close(self) -> None:
        """Shut down isolation-mode sampler worker pools (one2one services
        and the shared one2all pool).  Safe to call multiple times; daemon
        workers also die with the process, so this is hygiene, not
        correctness."""
        svc = getattr(self, "_one2all_service", None)
        if svc is not None:
            svc.close()
        for s_ in getattr(self, "samplers", {}).values() or []:
            close_fn = getattr(s_, "close", None)
            if close_fn is not None:
                close_fn()

    def _set_epoch_key(self, seed: int) -> None:
        self._epoch_key = jax.random.PRNGKey(seed ^ 0x5EED)
        # multi-process dispatch passes the folded key as host data (every
        # process derives the identical value); see multihost.host_fold_key
        self._epoch_key_host = np.asarray(self._epoch_key)

    def _shard_full_features(self, field_names):
        """Shard the full fused feature matrix cyclically across the mesh
        (halo.shard_features layout) and size the static halo width.
        Sets ``_feat_shards``/``_shard_rows``/``_halo_width``; returns
        (num_nodes, total_dim, stack_shape)."""
        from .halo import halo_width_for

        D = self.mesh.devices.size
        n = self.store.num_nodes
        total_dim = self.caches[0].total_dim
        dim = total_dim + (-total_dim) % 128   # lane-align the exchange rows
        if self.cfg.cache.dtype == "bfloat16":
            import ml_dtypes
            fdtype = ml_dtypes.bfloat16
        elif self.cfg.cache.dtype == "int8":
            fdtype = np.int8
        else:
            fdtype = np.float32
        # int8 tier: shard rows quantized with the store-wide per-column
        # scale (computed once by the FeatureCaches at construction);
        # dequant happens after the halo exchange, so ICI moves 1-byte rows
        quant = self.caches[0].dequant_scale
        self._exchange_scale = (
            np.pad(quant, (0, dim - total_dim), constant_values=1.0)
            if quant is not None else None)
        # One shard at a time via the place_dp callback, single- AND
        # multi-process: multi-process each host gathers only the rows its
        # chips own (cyclic: owner(v) = v % P, slot v // P, matching
        # halo.shard_features); single-process the peak transient is ONE
        # device slice instead of the full fused matrix + its stacked copy
        # (at rmat27 feat128 that full-materialization path peaked ~3x the
        # final shard bytes — the round-5 scale enabler).  A pre-quantized
        # int8 store short-circuits the gather→quantize round trip.
        self._shard_rows = shard_rows = -(-n // D)

        def feat_row(r: int) -> np.ndarray:
            mine = np.arange(r, n, D, dtype=np.int64)
            if quant is not None and self.store.is_quantized(field_names):
                f = self.store.gather(field_names, mine, quantized=True)
            else:
                f = self.store.gather(field_names, mine)
                if quant is not None:
                    from ..storage.cache import quantize_rows
                    f = quantize_rows(f, quant)
            out = np.zeros((shard_rows, dim), dtype=fdtype)
            out[: len(mine), : f.shape[1]] = f
            return out

        self._feat_shards = place_dp(
            feat_row, self.mesh, shape=(D, shard_rows, dim), dtype=fdtype)
        stack_shape = (D, shard_rows, dim)
        cap0 = self.cfg.sampler.batch_size
        for f in self.cfg.sampler.hop_fanouts():
            cap0 *= f + 1
        self._halo_width = halo_width_for(
            cap0, D, slack=self.cfg.train.halo_slack)
        return n, total_dim, stack_shape

    def _init_ici_device_mode(self, offsets, seed, field_names) -> None:
        """Full-graph CSR replicated per chip, features ICI-sharded; the
        whole epoch (sampling + halo exchange + train) is one dispatch."""
        from ..train.device_epoch import make_ici_device_epoch_fn

        g = self._full_graph
        if g.num_edges >= np.iinfo(np.int32).max:
            raise ValueError("full-graph edge count overflows int32")
        put_rep = lambda x: place_replicated(np.asarray(x), self.mesh)
        from ..sampling.device_sampler import pad_indices
        indptr32 = g.indptr.astype(np.int32)
        padded = pad_indices(g.indices)
        self._dev_indptr = put_rep(indptr32)
        self._dev_indices = put_rep(padded)
        # host-built (see _stack_partition_structure comment)
        self._dev_ptr_pairs = put_rep(
            np.stack([indptr32[:-1], np.diff(indptr32)], axis=1))
        self._dev_rows = put_rep(
            padded.reshape(-1, 8) if self.cfg.sampler.paired_draws
            else np.zeros((1, 8), dtype=np.int32))
        self._dev_train_nids = put_rep(
            np.asarray(self._full_train_nids, dtype=np.int32))
        self._dev_labels = put_rep(
            np.asarray(self._full_labels, dtype=np.int32))
        n, total_dim, stack_shape = self._shard_full_features(field_names)
        B = self.cfg.sampler.batch_size
        n_train = len(self._full_train_nids)
        D = self.mesh.devices.size
        self._dev_num_batches = max(1, -(-n_train // (D * B)))
        self.epoch_fn = make_ici_device_epoch_fn(
            self.cfg, self._tx, self.mesh, offsets, self._dev_num_batches,
            self._shard_rows, self._halo_width,
            dequant_scale=self._exchange_scale,
        )
        self._set_epoch_key(seed)
        self.halo_drops = 0
        if self.log:
            print(f"[ici-device] {n} x {total_dim} "
                  f"features sharded {stack_shape}, halo width "
                  f"{self._halo_width}, {self._dev_num_batches} steps/chip")

    def _fill_caches_device(self) -> None:
        """Full per-partition caches, padded to a uniform [max_n, dim].
        Multi-process, only the partitions owned by this process's devices
        are gathered — each host's DRAM holds 1/num_hosts of the features."""
        max_n = max(p.num_nodes for p in self.parts)
        rows = (local_dp_rows(self.mesh) if self._mp
                else list(range(len(self.caches))))
        for r in rows:
            cache = self.caches[r]
            cache.fill(capacity=cache.graph.num_nodes,
                       rank_by=self.cfg.cache.rank_by)
            if not cache.fully_cached:
                raise ValueError("on_device_sampling needs full per-chip caches")
            if cache.cache_values.shape[0] < max_n:
                pad = max_n - cache.cache_values.shape[0]
                cache.cache_values = jnp.pad(cache.cache_values,
                                             ((0, pad), (0, 0)))
        if self._mp:
            ref = self.caches[rows[0]].cache_values
            self._cache_stacked = place_dp(
                lambda r: np.asarray(self.caches[r].cache_values),
                self.mesh,
                shape=(len(self.caches), max_n, ref.shape[1]),
                dtype=ref.dtype,
            )
        else:
            stacked = np.stack(
                [np.asarray(c.cache_values) for c in self.caches])
            self._cache_stacked = jax.device_put(stacked, self._dp)
        if self.log:
            print(f"[cache] full per-chip caches, {max_n} rows each")

    def _init_ici_features(self, field_names) -> None:
        """Shard the full fused feature matrix across the mesh's HBM and
        build per-chip halo planners (parallel/halo.py) — the per-batch
        HOST-pipeline flavor of the device modes' feature placement.
        Shares the cyclic-ownership gather with _shard_full_features;
        the halo width is sized from the CALIBRATED layer-0 capacity
        (the host pipeline's plan arrays are [P, H] per batch)."""
        from .halo import HaloPlanner, halo_width_for

        D = self.mesh.devices.size
        n, total_dim, stack_shape = self._shard_full_features(field_names)
        self._halo_width = halo_width_for(
            self.caps[0], D, slack=self.cfg.train.halo_slack)
        self._planner = HaloPlanner(D, self._shard_rows, self._halo_width)
        self.halo_drops = 0
        if self.log:
            print(f"[ici] {n} x {total_dim} features sharded "
                  f"{tuple(stack_shape)}, halo width {self._halo_width}")

    # -- construction helpers ------------------------------------------------

    @classmethod
    def from_dataset(cls, cfg: Config, ds: Dataset, *, mesh: Optional[Mesh] = None,
                     seed: int = 0, log: bool = False,
                     feature_source: str = "cache",
                     dispatch: str = "one2one") -> "DataParallelTrainer":
        mesh = mesh or make_mesh()
        n = mesh.devices.size
        pre = None
        if cfg.model.preprocess:
            pre = "gcn" if cfg.model.arch in ("gcn", "gcn_cv") else cfg.model.arch
        store = FeatureStore.build(ds.graph, ds.features, preprocess=pre)
        hops = cfg.partition.num_hops
        one2all = cfg.train.remote_sampling and dispatch == "one2all"
        if (cfg.train.on_device_sampling and feature_source == "ici") or one2all:
            # full-graph sampling on every chip: partitioning is not used,
            # but the constructor wants one PartitionArtifact per device —
            # give each chip a view of the full graph (cheap: same arrays)
            parts = [
                PartitionArtifact(
                    graph=ds.graph, train_nids=ds.train_nids,
                    labels=ds.labels,
                    local2full=np.arange(ds.num_nodes, dtype=np.int64),
                )
                for _ in range(n)
            ]
        elif cfg.partition.method == "dg":
            parts = dg_partition(ds.graph, ds.train_nids, ds.labels, n, hops,
                                 edge_balance=cfg.partition.edge_balance)
        elif cfg.partition.method == "kl":
            from ..partition import kl_partition
            parts = kl_partition(ds.graph, ds.train_nids, ds.labels, n, hops,
                                 seed=seed)
        else:
            parts = hash_partition(ds.graph, ds.train_nids, ds.labels, n, hops,
                                   seed=seed)
        return cls(cfg, store, parts, mesh=mesh, seed=seed, log=log,
                   feature_source=feature_source, dispatch=dispatch,
                   full_graph=ds.graph, full_train_nids=ds.train_nids,
                   full_labels=ds.labels, full_val_mask=ds.val_mask,
                   full_features=ds.features)

    # -- cache ---------------------------------------------------------------

    def fill_caches(self) -> None:
        c = self.cfg.cache
        if not c.enabled:
            cap = 0
        elif c.capacity is not None:
            cap = c.capacity
        else:
            # uniform capacity: whatever HBM each chip can spare, bounded by
            # the largest partition (cache arrays must stack uniformly).
            # auto_capacity depends only on row dtype/dim + the HBM budget,
            # so every process computes the identical value — safe to take
            # the min over LOCAL caches under multi-process.
            cap = min(
                self.caches[r].auto_capacity(c.hbm_reserve_bytes)
                for r in self._local_rows
            )
        cap = max(0, min(cap, max(p.num_nodes for p in self.parts)))
        for r in self._local_rows:
            cache = self.caches[r]
            cache.fill(capacity=min(cap, cache.graph.num_nodes), rank_by=c.rank_by)
            # pad shard to uniform [cap, dim] for stacking
            if cache.cache_values.shape[0] < max(cap, 1):
                pad = max(cap, 1) - cache.cache_values.shape[0]
                cache.cache_values = jnp.pad(cache.cache_values, ((0, pad), (0, 0)))
        max_n = max(p.num_nodes for p in self.parts)
        ref = self.caches[self._local_rows[0]].cache_values
        self._cache_stacked = place_dp(
            lambda r: np.asarray(self.caches[r].cache_values),
            self.mesh, shape=(len(self.caches),) + ref.shape,
            dtype=ref.dtype) if self._mp else jax.device_put(
            np.stack([np.asarray(ch.cache_values) for ch in self.caches]),
            self._dp)

        def row_map(r):
            m = np.full(max_n, -1, dtype=np.int32)
            m[: len(self.caches[r].cache_map)] = self.caches[r].cache_map
            return m

        # residency maps, padded to the largest partition with -1
        self._cache_map_stacked = place_dp(
            row_map, self.mesh, shape=(len(self.caches), max_n),
            dtype=np.int32) if self._mp else jax.device_put(
            np.stack([row_map(r) for r in range(len(self.caches))]),
            self._dp)
        if self.log:
            print(f"[cache] per-chip capacity={cap} vertices")

    # -- epoch loop ----------------------------------------------------------

    def _next_round(self, iters):
        """One lockstep round of minibatches for this process's rows
        (``iters`` is {global_row: iterator}); shorter partitions wrap."""
        mbs = {}
        for r, it in list(iters.items()):
            try:
                mb = next(it)
            except StopIteration:
                iters[r] = self.samplers[r].epoch()       # wrap: make-up batch
                mb = next(iters[r])
            # edges come device-psum'd from the step (exact, global);
            # vertices only the host knows (inner-layer masks don't travel)
            self._epoch_vertices += mb.num_loaded_vertices()
            mbs[r] = mb
        return mbs

    def _put_rows(self, rows: dict, dtype=None):
        """Global dp-sharded array (or pytree of them, e.g. HaloPlan stacks)
        from per-row host values.  Multi-process, only this process's rows
        are present — the callback materializes exactly the addressable
        shards."""
        D = len(self.parts)
        keys = sorted(rows)

        def put_leaf(*xs):
            xs = [np.asarray(x) for x in xs]
            if not self._mp:
                full = {k: x for k, x in zip(keys, xs)}
                return jax.device_put(
                    np.stack([full[r] for r in range(D)]), self._dp)
            byrow = {k: x for k, x in zip(keys, xs)}
            return place_dp(lambda r: byrow[r], self.mesh,
                            shape=(D,) + xs[0].shape,
                            dtype=dtype or xs[0].dtype)

        return jax.tree.map(put_leaf, *[rows[k] for k in keys])

    def _epoch_batches(self):
        """Yields (layout, {r: i32}, {r: u8}, {r: f32}) packed row dicts
        (cache mode) or (layout, i32, u8, HaloPlan-stack) (ici mode).
        Multi-process, only this process's rows appear in the dicts; the
        step count is the GLOBAL lockstep maximum."""
        from ..sampling.pack import make_layout, pack

        iters = {r: self.samplers[r].epoch() for r in self._local_rows}
        steps = max(s.num_batches for s in self.samplers.values())
        fanout = self.cfg.sampler.block_fanouts()
        total_dim = self.caches[0].total_dim
        ici = self.feature_source == "ici"
        for _ in range(steps):
            mbs = self._next_round(iters)
            if ici:
                from ..storage.cache import FetchPlan
                layout = make_layout(self.caps, fanout, 0, 0,
                                     device_plan=True)
                halos, packed = [], []
                empty = FetchPlan(
                    hit_mask=np.zeros(self.caps[0], dtype=bool),
                    cache_pos=np.zeros(self.caps[0], dtype=np.int32),
                    miss_slot=np.zeros(self.caps[0], dtype=np.int32),
                    miss_feats=np.zeros((0, 0), dtype=np.float32),
                )
                halos, packed = {}, {}
                for r in sorted(mbs):
                    mb = mbs[r]
                    full = self.parts[r].local2full[np.asarray(mb.input_nids)]
                    h = self._planner.plan(full, np.asarray(mb.input_mask))
                    self.halo_drops += int(
                        np.asarray(mb.input_mask).sum()
                        - np.asarray(h.valid).sum()
                    )
                    halos[r] = h
                    packed[r] = pack(mb, empty, layout)
                yield (layout,
                       {r: pk[0] for r, pk in packed.items()},
                       {r: pk[1] for r, pk in packed.items()},
                       halos)
                continue
            plans = {r: self.caches[r].fetch_plan(
                np.asarray(mbs[r].input_nids), np.asarray(mbs[r].input_mask)
            ) for r in mbs}
            if self._mp:
                # multi-process: the layout is a STATIC cross-process
                # contract (shard_map executables must agree), so the miss
                # bucket is pinned to the worst case instead of this
                # round's local maximum
                max_bucket = self.caps[0]
            else:
                # per-device miss buckets differ: pad to the largest so the
                # stacked buffers are uniform (zero rows never gathered)
                max_bucket = max(p.miss_feats.shape[0] for p in plans.values())
            layout = make_layout(self.caps, fanout, total_dim, max_bucket,
                                 device_plan=True)
            packed = {}
            for r, mb in mbs.items():
                plan = plans[r]
                if plan.miss_feats.shape[0] < max_bucket:
                    plan = dataclasses.replace(
                        plan,
                        miss_feats=np.pad(
                            plan.miss_feats,
                            ((0, max_bucket - plan.miss_feats.shape[0]), (0, 0)),
                        ),
                    )
                packed[r] = pack(mb, plan, layout)
            yield (layout,
                   {r: pk[0] for r, pk in packed.items()},
                   {r: pk[1] for r, pk in packed.items()},
                   {r: pk[2] for r, pk in packed.items()})

    def _warn_halo_drops(self, epoch: int, drops: int) -> None:
        """One loud warning per epoch when the static halo width overflowed:
        dropped requests train on ZEROED layer-0 features (halo.py masks
        them), which silently degrades the loss.  halo_drops also lands in
        the train() summary so it is never invisible."""
        if drops <= 0:
            return
        import warnings
        warnings.warn(
            f"epoch {epoch}: {drops} halo requests overflowed the static "
            f"halo width {self._halo_width} and trained on zeroed features "
            f"— raise cfg.train.halo_slack (currently "
            f"{self.cfg.train.halo_slack}) or rebalance partitions",
            RuntimeWarning,
            stacklevel=3,
        )

    def run_epoch(self, epoch: int = 0) -> EpochMetrics:
        if self._device_mode:
            return self._run_epoch_on_device(epoch)
        self._epoch_vertices = 0
        drops0 = getattr(self, "halo_drops", 0)
        ici = self.feature_source == "ici"
        if not ici and self._cache_stacked is None:
            self.fill_caches()
        for r in self._local_rows:
            self.caches[r].reset_stats()
        t0 = time.perf_counter()
        nb = 0
        acc_buf = place_replicated(np.zeros(4, dtype=np.float32), self.mesh)
        for layout, i32, u8, extra in self._epoch_batches():
            with self.timers.scope("h2d"):
                i32 = self._put_rows(i32)
                u8 = self._put_rows(u8)
                extra = self._put_rows(extra)
            with self.timers.scope("step"):
                if ici:
                    self.state, acc_buf = self.step_fn(
                        layout, self.state, acc_buf, i32, u8, extra,
                        self._feat_shards,
                    )
                else:
                    self.state, acc_buf = self.step_fn(
                        layout, self.state, acc_buf, i32, u8, extra,
                        self._cache_stacked, self._cache_map_stacked,
                    )
            nb += 1
        vals = np.asarray(acc_buf)
        tot_loss, tot_acc = float(vals[0]), float(vals[1])
        miss = (0.0 if ici
                else float(np.mean([self.caches[r].miss_rate()
                                    for r in self._local_rows])))
        em = EpochMetrics(
            epoch=epoch,
            mean_loss=tot_loss / max(nb, 1),
            mean_acc=tot_acc / max(nb, 1),
            time_s=time.perf_counter() - t0,
            miss_rate=miss,
            num_batches=nb,
            # edges: device-psum'd GLOBAL count (exact; the neigh masks
            # travel with the packed batch).  vertices: host counter —
            # inner-layer masks are not transmitted, so only the host knows
            # the true valid counts; under multi-process this covers THIS
            # process's partitions only.
            edges=int(vals[3]),
            vertices=self._epoch_vertices,
        )
        self.epoch_metrics.append(em)
        if ici:
            self._warn_halo_drops(epoch, self.halo_drops - drops0)
        if self.log:
            print(
                f"epoch {epoch}: loss={em.mean_loss:.4f} acc={em.mean_acc:.3f} "
                f"time={em.time_s:.2f}s miss={em.miss_rate:.1%}"
            )
        return em

    def _dispatch_device_epoch(self, epoch: int):
        ici = self.feature_source == "ici"
        if (self.feature_source == "cache"
                and self._cache_stacked is None):
            self._fill_caches_device()
        key = (host_fold_key(self._epoch_key_host, epoch) if self._mp
               else jax.random.fold_in(self._epoch_key, epoch))
        if getattr(self, "_is_cv", False):
            if self.feature_source == "edge":
                (self.state, self._dev_hists, self._dev_aggs,
                 acc) = self.epoch_fn(
                    self.state, self._dev_hists, self._dev_aggs, key,
                    self._dev_train_nids, self._dev_counts,
                    self._dev_labels, self._dev_indptr, self._dev_indices,
                    self._dev_ptr_pairs, self._dev_rows,
                    self._dev_local2full, self._feat_shards,
                    self._dev_esrc, self._dev_edst, self._dev_invdeg,
                )
                return acc
            (self.state, self._dev_hists, self._dev_aggs,
             acc) = self.epoch_fn(
                self.state, self._dev_hists, self._dev_aggs, key,
                self._dev_train_nids, self._dev_counts, self._dev_labels,
                self._dev_indptr, self._dev_indices, self._dev_ptr_pairs,
                self._dev_rows, self._cache_stacked,
                self._dev_esrc, self._dev_edst, self._dev_invdeg,
            )
            return acc
        if ici:
            self.state, acc = self.epoch_fn(
                self.state, key, self._dev_train_nids,
                self._dev_labels, self._dev_indptr, self._dev_indices,
                self._dev_ptr_pairs, self._dev_rows, self._feat_shards,
            )
        elif self.feature_source == "edge":
            self.state, acc = self.epoch_fn(
                self.state, key, self._dev_train_nids, self._dev_counts,
                self._dev_labels, self._dev_indptr, self._dev_indices,
                self._dev_ptr_pairs, self._dev_rows,
                self._dev_local2full, self._feat_shards,
            )
        else:
            self.state, acc = self.epoch_fn(
                self.state, key, self._dev_train_nids,
                self._dev_counts, self._dev_labels, self._dev_indptr,
                self._dev_indices, self._dev_ptr_pairs, self._dev_rows,
                self._cache_stacked,
            )
        return acc

    def _device_epoch_metrics(self, epoch, vals, time_s) -> EpochMetrics:
        if self.feature_source in ("ici", "edge"):
            self.halo_drops += int(vals[5])
            self._warn_halo_drops(epoch, int(vals[5]))
        steps = max(int(vals[2]), 1)
        em = EpochMetrics(
            epoch=epoch,
            mean_loss=float(vals[0]) / steps,
            mean_acc=float(vals[1]) / steps,
            time_s=time_s,
            miss_rate=0.0,
            num_batches=int(vals[2]),
            edges=int(vals[3]),
            vertices=int(vals[4]),
        )
        self.epoch_metrics.append(em)
        if self.log:
            print(
                f"epoch {epoch}: loss={em.mean_loss:.4f} "
                f"acc={em.mean_acc:.3f} time={em.time_s:.2f}s [on-device dp]"
            )
        return em

    def _run_epoch_on_device(self, epoch: int) -> EpochMetrics:
        t0 = time.perf_counter()
        with self.timers.scope("step"):
            acc = self._dispatch_device_epoch(epoch)
            jax.block_until_ready(acc)
        t_done = time.perf_counter()
        return self._device_epoch_metrics(epoch, np.asarray(acc), t_done - t0)

    def _train_on_device(self, epochs: int, start_epoch: int = 0) -> None:
        """Overlapped epoch dispatches (see Trainer._train_on_device)."""
        if start_epoch >= epochs:
            return
        prev = None
        prev_t = time.perf_counter()
        for e in range(start_epoch, epochs):
            with self.timers.scope("step"):
                acc = self._dispatch_device_epoch(e)
            if prev is not None:
                jax.block_until_ready(prev)
                t = time.perf_counter()
                self._device_epoch_metrics(e - 1, np.asarray(prev), t - prev_t)
                prev_t = t
            prev = acc
        jax.block_until_ready(prev)
        t = time.perf_counter()
        self._device_epoch_metrics(epochs - 1, np.asarray(prev), t - prev_t)

    # -- checkpointing (same on-disk contract as Trainer / cli.eval) --------

    def _cv_aux(self):
        """dp gcn_cv: the per-partition hist/agg stacks as a checkpointable
        pytree for the single-process orbax ``.aux`` sidecar.  Multi-process
        returns None (no process holds the full global arrays) — that case
        is covered by the per-process shard files instead
        (``_save_cv_aux_shards`` / checkpoint.save_aux_shards)."""
        if not getattr(self, "_is_cv", False) or self._mp:
            return None
        return {"hist": [np.asarray(h) for h in self._dev_hists],
                "agg": [np.asarray(a) for a in self._dev_aggs]}

    def _save_cv_aux_shards(self, epoch: int) -> None:
        """Multi-process CV aux: EVERY process writes the dp-axis rows its
        devices own to ``<arch>_<epoch>.aux.p<pid>.npz`` (the round-3 gap:
        this used to be skipped with a resume warning)."""
        from ..train.checkpoint import save_aux_shards

        save_aux_shards(
            self.cfg.train.ckpt_dir, self.cfg.model.arch, epoch,
            {"hist": list(self._dev_hists), "agg": list(self._dev_aggs)})

    def _maybe_checkpoint(self, epoch: int) -> None:
        tc = self.cfg.train
        if not (tc.ckpt_dir and tc.ckpt_every):
            return
        if (epoch + 1) % tc.ckpt_every:
            return
        # state is replicated: every process holds the full value.  ALL
        # processes must enter the orbax save (it synchronizes globally and
        # lets the primary host write); gating on process 0 deadlocks the
        # gloo barrier.
        from ..train.checkpoint import save_checkpoint

        save_checkpoint(tc.ckpt_dir, self.cfg.model.arch, epoch,
                        jax.device_get(self.state), aux=self._cv_aux())
        if getattr(self, "_is_cv", False) and self._mp:
            # sharded CV histories: every process writes its own rows
            self._save_cv_aux_shards(epoch)

    def resume(self, epoch: Optional[int] = None) -> int:
        """Restore the newest (or given) checkpoint into the replicated
        state; returns the epoch to continue from.  Multi-process, every
        process restores from the same path (shared filesystem, the normal
        pod setup)."""
        from ..train.checkpoint import list_checkpoints, restore_checkpoint

        tc = self.cfg.train
        if not tc.ckpt_dir:
            raise ValueError("cfg.train.ckpt_dir is not set")
        have = list_checkpoints(tc.ckpt_dir, self.cfg.model.arch)
        if not have:
            return 0
        epoch = have[-1] if epoch is None else epoch
        restored = restore_checkpoint(
            tc.ckpt_dir, self.cfg.model.arch, epoch,
            jax.device_get(self.state))
        self.state = place_replicated(restored, self.mesh)
        if getattr(self, "_is_cv", False):
            self._restore_cv_aux(epoch)
        return epoch + 1

    def _restore_cv_aux(self, epoch: int) -> None:
        """Restore CV hist/agg from whichever aux format the checkpoint was
        written under: per-process ``.aux.p*.npz`` shard files (multi-process
        writer) or the single-file orbax ``.aux`` sidecar (single-process
        writer).  Either layout restores under either launch (ADVICE r4 #2 —
        a cross-layout resume used to silently zero the histories)."""
        from ..train.checkpoint import open_aux_shards, restore_aux

        get_row = open_aux_shards(self.cfg.train.ckpt_dir,
                                  self.cfg.model.arch, epoch)
        if get_row is not None:
            # shard files: each process materializes only the rows its
            # devices own (place_dp callback form) — works single- and
            # multi-process
            def place(name, b, ref):
                cb = lambda r: get_row(f"{name}{b}_row{r}")
                return place_dp(cb, self.mesh, shape=ref.shape,
                                dtype=ref.dtype)
            try:
                self._dev_hists = tuple(
                    place("hist", b, h)
                    for b, h in enumerate(self._dev_hists))
                self._dev_aggs = tuple(
                    place("agg", b, a)
                    for b, a in enumerate(self._dev_aggs))
            except KeyError as e:
                raise ValueError(
                    f"CV aux shard files for epoch {epoch} are missing "
                    f"row {e} — was the checkpoint written with a "
                    "different mesh size? (rows are keyed by GLOBAL dp "
                    "index; the device count must match)") from None
            return
        # orbax .aux sidecar (single-process writer).  A zero template of
        # the right shapes works under any process layout — each process
        # reads the file and places only its rows.
        template = {"hist": [np.zeros(h.shape, h.dtype)
                             for h in self._dev_hists],
                    "agg": [np.zeros(a.shape, a.dtype)
                            for a in self._dev_aggs]}
        aux = restore_aux(self.cfg.train.ckpt_dir, self.cfg.model.arch,
                          epoch, template)
        if aux is None:
            import warnings
            warnings.warn(
                f"checkpoint {self.cfg.model.arch}_{epoch} has no usable "
                ".aux CV histories in either format (pre-aux checkpoint): "
                "resuming with ZERO hist/agg — the control-variate term is "
                "wrong until the first post-resume epoch refreshes them",
                RuntimeWarning, stacklevel=3)
            return
        def put(name, b, ref):
            full = np.asarray(aux[name][b])
            cb = lambda r: full[r]
            return place_dp(cb, self.mesh, shape=ref.shape, dtype=ref.dtype)
        self._dev_hists = tuple(put("hist", b, h)
                                for b, h in enumerate(self._dev_hists))
        self._dev_aggs = tuple(put("agg", b, a)
                               for b, a in enumerate(self._dev_aggs))

    def _maybe_eval(self, epoch: int) -> None:
        """Validation accuracy over the FULL graph every
        ``cfg.train.eval_every`` epochs (params are replicated; process 0
        logs).  Inference consumes RAW features (under preprocess the
        store's 'features' field holds the pre-aggregated matrix, so
        from_dataset keeps the raw one in ``_full_features``)."""
        ev = self.cfg.train.eval_every
        if not ev or (epoch + 1) % ev != 0:
            return
        from ..models.inference import evaluate

        if self._full_features is not None:
            feats = self._full_features
        elif self.cfg.model.preprocess:
            raise ValueError(
                "eval under preprocess needs the RAW feature matrix (the "
                "store's 'features' field holds the pre-aggregation): pass "
                "full_features= (from_dataset does this automatically)"
            )
        else:
            feats = self.store.fields["features"]
        params = jax.device_get(self.state.params)
        acc = evaluate(params, self.cfg.model, self._full_graph,
                       feats, self._full_labels,
                       self._full_val_mask,
                       backend=self.cfg.train.eval_backend)
        if self.epoch_metrics:
            self.epoch_metrics[-1].val_acc = acc
        if self.log:
            print(f"  [eval] epoch {epoch}: val acc {acc:.3f}")

    def train(self, epochs: Optional[int] = None, *,
              start_epoch: int = 0) -> Dict:
        epochs = epochs or self.cfg.train.epochs
        ckpt = bool(self.cfg.train.ckpt_dir and self.cfg.train.ckpt_every)
        if self._device_mode and not ckpt and not self.cfg.train.eval_every:
            self._train_on_device(epochs, start_epoch)
        else:
            # per-epoch dispatch (synced at each boundary) so the state can
            # be snapshotted between epochs
            for e in range(start_epoch, epochs):
                if self._device_mode:
                    self._run_epoch_on_device(e)
                else:
                    self.run_epoch(e)
                self._maybe_eval(e)
                self._maybe_checkpoint(e)
        w = self.cfg.train.warmup_epochs
        steady = self.epoch_metrics[w:] or self.epoch_metrics
        return {
            "epochs": len(self.epoch_metrics),
            "num_devices": int(self.mesh.devices.size),
            "num_processes": int(jax.process_count()),
            "mean_epoch_time_s": float(np.mean([m.time_s for m in steady])),
            "edges_per_epoch": int(self.epoch_metrics[-1].edges),
            "first_loss": self.epoch_metrics[0].mean_loss,
            "final_loss": self.epoch_metrics[-1].mean_loss,
            "final_acc": self.epoch_metrics[-1].mean_acc,
            "miss_rate": self.epoch_metrics[-1].miss_rate,
            "val_acc": next(
                (m.val_acc for m in reversed(self.epoch_metrics)
                 if m.val_acc is not None), None),
            "halo_drops": int(getattr(self, "halo_drops", 0)),
            "phase_timers": self.timers.summary(),
        }
