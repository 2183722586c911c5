"""Single-device training loop — the flagship trainer.

Functional re-design of the reference's per-GPU trainer process
(reference: examples/profile/pa_gcn.py:27-113): attach store, build cache,
sample, fetch, step — with the reference's measurement methodology (epoch
times excluding warm-up epochs, per-epoch cache miss rate, load/compute phase
split).  Multi-device data parallelism lives in ``pagraph_tpu.parallel``.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..config import Config
from ..data.formats import Dataset, PartitionArtifact
from ..graph import CSRGraph
from ..sampling.loader import PrefetchLoader
from ..sampling.sampler import NeighborSampler
from ..storage.cache import FeatureCache
from ..storage.feature_store import FeatureStore
from ..utils.timers import PhaseTimers
from .state import create_state


@dataclasses.dataclass
class EpochMetrics:
    epoch: int
    mean_loss: float
    mean_acc: float
    time_s: float
    miss_rate: float
    num_batches: int
    edges: int = 0          # valid sampled edges aggregated this epoch
    vertices: int = 0       # valid vertices loaded this epoch
    val_acc: Optional[float] = None   # set on eval_every epochs
    h2d_bytes: int = 0      # batch bytes shipped host->device this epoch
                            # (packed i32/u8 + miss rows; the overlap-probe
                            # numerator, VERDICT r4 item #3)


class Trainer:
    """One-device trainer over a (partition of a) dataset."""

    def __init__(
        self,
        cfg: Config,
        store: FeatureStore,
        local_graph: CSRGraph,
        train_nids: np.ndarray,          # LOCAL ids
        labels: np.ndarray,              # LOCAL space labels
        local2full: Optional[np.ndarray] = None,
        *,
        device: Optional[jax.Device] = None,
        seed: int = 0,
        log: bool = False,
        eval_data: Optional[tuple] = None,  # (graph, features, labels, mask)
                                            # in FULL-graph space, for
                                            # cfg.train.eval_every
    ):
        self.cfg = cfg
        self.store = store
        self.device = device
        self.log = log
        self._eval_data = eval_data
        if cfg.train.halo_pipeline:
            raise ValueError(
                "train.halo_pipeline is a multi-chip EDGE-mode knob "
                "(DataParallelTrainer, feature_source='edge'); the "
                "single-chip trainer has no halo exchange to pipeline"
            )
        if cfg.train.eval_every and eval_data is None:
            raise ValueError(
                "cfg.train.eval_every is set but no eval_data was given "
                "(Trainer.from_dataset wires it automatically)"
            )
        field_names = ["features"]
        if cfg.model.arch == "graphsage" and cfg.model.preprocess:
            field_names.append("neigh")
        self.cache = FeatureCache(
            store, field_names, local_graph, local2full, device=device,
            dtype=cfg.cache.dtype,
            # on-device path reads cache rows directly: 128-lane alignment
            # measurably speeds the HBM gather (no miss path to conflict)
            pad_dim_to=128 if cfg.train.on_device_sampling else 1,
        )
        if cfg.cache.rank_by == "access_freq":
            self.cache.track_access = True
        self._device_mode = cfg.train.on_device_sampling
        if self._device_mode:
            # Whole-epoch on-device path (train/device_epoch.py): the CSR and
            # the full feature cache live in HBM; no host sampler/loader at
            # all.  Nothing crosses the host link inside an epoch.
            import jax.numpy as jnp

            from ..sampling.device_sampler import DeviceCSR
            from .device_epoch import make_device_epoch_fn

            def put(x):
                return jax.device_put(x, device) if device else jnp.asarray(x)

            # paired: the [E/8, 8] row table is built host-side and
            # transferred ONCE, for EVERY dispatch mode — a device-side
            # reshape (with_rows) gets a T(8,128)-tiled output buffer, 16x
            # the logical bytes (DeviceCSR.from_graph docstring)
            self._dev_csr = DeviceCSR.from_graph(
                local_graph, device, paired=cfg.sampler.paired_draws)
            self._dev_train_nids = put(train_nids.astype(np.int32))
            self._dev_labels = put(np.asarray(labels, dtype=np.int32))
            self.sampler = None
            self.loader = None
            self.state, self._tx = create_state(cfg, seed=seed)
            if device is not None:
                self.state = jax.device_put(self.state, device)
            self._is_cv = cfg.model.arch == "gcn_cv"
            self._step_mode = cfg.train.epoch_dispatch == "steps"
            self._pipelined_mode = cfg.train.epoch_dispatch == "pipelined"
            if (self._step_mode or self._pipelined_mode) and self._is_cv:
                raise ValueError(
                    f"epoch_dispatch={cfg.train.epoch_dispatch!r} does not "
                    "support gcn_cv (the epoch-end aggregated-history "
                    "refresh needs the whole-epoch dispatch); use "
                    "epoch_dispatch='scan'")
            if self._is_cv:
                # device-resident CV histories + padded edge list for the
                # end-of-epoch exact aggregated-history refresh
                from ..models.gcn_cv import layer_widths
                from .device_epoch import make_cv_device_epoch_fn

                n = local_graph.num_nodes
                widths = layer_widths(cfg.model)
                self._dev_hists = tuple(
                    put(np.zeros((n, w), np.float32)) for w in widths)
                self._dev_aggs = tuple(
                    put(np.zeros((n, w), np.float32)) for w in widths)
                # scatter-free refresh tables (round 5): degree-bucketed
                # padded in-neighbor windows, device_put as jit ARGUMENTS
                from ..models.inference import _BucketedNeighborhoods
                bn = _BucketedNeighborhoods(local_graph)
                self._dev_nbrs = jax.tree.map(put, bn.device_args())
                self._dev_invdeg = put(
                    (1.0 / np.maximum(local_graph.in_degrees, 1)
                     ).astype(np.float32))
                self.epoch_fn = make_cv_device_epoch_fn(
                    cfg, self._tx, self.cache.field_offsets, n,
                    dequant_scale=self.cache.dequant_scale_padded,
                    nbr_meta=bn.static_meta(),
                )
            elif self._step_mode:
                from .device_epoch import make_device_step_fns
                self._prepare_fn, self._step_fn = make_device_step_fns(
                    cfg, self._tx, self.cache.field_offsets,
                    dequant_scale=self.cache.dequant_scale_padded,
                )
                self._num_batches = -(-len(train_nids)
                                      // cfg.sampler.batch_size)
            elif self._pipelined_mode:
                from .device_epoch import make_device_pipelined_fns
                (self._prepare_fn, self._gather_fn,
                 self._train_fn) = make_device_pipelined_fns(
                    cfg, self._tx, self.cache.field_offsets,
                    dequant_scale=self.cache.dequant_scale_padded,
                )
                self._num_batches = -(-len(train_nids)
                                      // cfg.sampler.batch_size)
            else:
                self.epoch_fn = make_device_epoch_fn(
                    cfg, self._tx, self.cache.field_offsets,
                    dequant_scale=self.cache.dequant_scale_padded,
                )
            self._epoch_key = jax.random.PRNGKey(seed ^ 0x5EED)
            self.timers = PhaseTimers()
            self._cache_filled = False
            self.epoch_metrics: List[EpochMetrics] = []
            return
        if cfg.train.remote_sampling:
            # isolation mode: sampling in worker processes (reference's
            # pa_iso / SampleDeliver path, dataloader.py:68-181)
            from ..sampling.service import SampleService
            caps = None
            if cfg.sampler.auto_caps:
                probe = NeighborSampler(local_graph, train_nids, cfg.sampler,
                                        labels=labels, seed=seed)
                caps = probe.calibrate_caps()
            self.sampler = SampleService(
                local_graph, train_nids, cfg.sampler, labels=labels,
                seed=seed, caps=caps,
            )
        else:
            self.sampler = NeighborSampler(
                local_graph, train_nids, cfg.sampler, labels=labels, seed=seed,
            )
            if cfg.sampler.auto_caps:
                self.sampler.calibrate_caps()
        self.loader = PrefetchLoader(
            self.sampler, self.cache,
            prefetch=cfg.sampler.prefetch, device=device,
        )
        self.state, self._tx = create_state(cfg, seed=seed)
        if device is not None:
            self.state = jax.device_put(self.state, device)
        self._is_cv = cfg.model.arch == "gcn_cv"
        if self._is_cv:
            from ..models.gcn_cv import CVHistory
            from .state import make_cv_train_step
            self.cv_history = CVHistory(cfg.model, local_graph,
                                        local_graph.num_nodes)
            self.step_fn = make_cv_train_step(
                cfg, self._tx, self.cache.field_offsets,
                dequant_scale=self.cache.dequant_scale_padded,
            )
        else:
            from .state import make_multistep_train_step, make_packed_train_step
            self.loader.packed = True
            self._group = max(1, cfg.train.steps_per_dispatch)
            if self._group > 1:
                self.loader.host_output = True
                self.multistep_fn = make_multistep_train_step(
                    cfg, self._tx, self.cache.field_offsets,
                    dequant_scale=self.cache.dequant_scale_padded,
                )
            self.step_fn = make_packed_train_step(
                cfg, self._tx, self.cache.field_offsets,
                dequant_scale=self.cache.dequant_scale_padded,
            )
        self.timers = PhaseTimers()
        self._cache_filled = False
        self.epoch_metrics: List[EpochMetrics] = []

    @classmethod
    def from_dataset(cls, cfg: Config, ds: Dataset, **kw) -> "Trainer":
        pre = None
        if cfg.model.preprocess:
            # gcn_cv consumes the same mean-preaggregated layer-0 as gcn
            pre = "gcn" if cfg.model.arch in ("gcn", "gcn_cv") else cfg.model.arch
        store = FeatureStore.build(ds.graph, ds.features, preprocess=pre)
        if cfg.train.eval_every and "eval_data" not in kw:
            kw["eval_data"] = (ds.graph, ds.features, ds.labels, ds.val_mask)
        return cls(cfg, store, ds.graph, ds.train_nids, ds.labels, **kw)

    @classmethod
    def from_partition(cls, cfg: Config, part: PartitionArtifact,
                       store: FeatureStore, **kw) -> "Trainer":
        return cls(cfg, store, part.graph, part.train_nids, part.labels,
                   part.local2full, **kw)

    def _maybe_fill_cache(self) -> None:
        """Size & fill the cache once, BEFORE the first step.

        The reference fills after the first training step because it must
        probe torch's allocator for peak usage (pa_gcn.py:99-100,
        storage.py:77-88).  Under XLA every array size is known statically,
        so the free-HBM budget needs no warm-up probe — filling up front is
        the same capacity decision without running one batch at 100% miss
        rate (deviation from reference timing noted in PARITY.md)."""
        if self._cache_filled:
            return
        c = self.cfg.cache
        cap = 0 if not c.enabled else c.capacity
        if self._device_mode:
            cap = self.cache.graph.num_nodes if cap is None else cap
        self.cache.fill(capacity=cap, rank_by=c.rank_by)
        if self._device_mode and not self.cache.fully_cached:
            raise ValueError(
                f"on_device_sampling needs the full feature set in HBM: "
                f"capacity {self.cache.capacity} < "
                f"{self.cache.graph.num_nodes} vertices. Lower feat_dim, "
                f"use cache.dtype='bfloat16' (or 'int8'), or partition "
                f"across chips."
            )
        self._cache_filled = True
        if self._device_mode:
            self._drain_pending_h2d()
        if self.log:
            print(
                f"[cache] capacity={self.cache.capacity} vertices "
                f"({'full' if self.cache.fully_cached else 'partial'})"
            )

    def _drain_pending_h2d(self) -> None:
        """Force the async H2D transfers of the big device-resident inputs
        (cache, CSR, row table) to complete BEFORE the first epoch dispatch.

        ``jax.device_put`` is async; over the axon tunnel the multi-GB
        transfers otherwise drain DURING the first dispatched epoch and get
        misattributed to it (the rmat25 run: "epoch 1: 237 s" with exactly
        one compile in the JAX_LOG_COMPILES log — and in hindsight the
        round-3 "second dispatch recompiled, 275 s / 155 s" entries carry
        the same signature).  ``block_until_ready`` is not reliable on axon
        (CLAUDE.md), so fetch one element of each array instead — the D2H
        read cannot complete before the H2D it depends on."""
        arrs = [self.cache.cache_values, self._dev_csr.indices,
                self._dev_csr.indptr, self._dev_labels,
                self._dev_train_nids]
        for a in (self._dev_csr.indices_rows, self._dev_csr.ptr_pairs):
            if a is not None:
                arrs.append(a)
        t0 = time.perf_counter()
        for a in arrs:
            if a.size:
                np.asarray(a[(0,) * a.ndim])
        if self.log:
            print(f"[h2d] device inputs resident "
                  f"({time.perf_counter()-t0:.1f}s drain)")

    def run_epoch(self, epoch: int = 0) -> EpochMetrics:
        if self._device_mode:
            return self._run_epoch_on_device(epoch)
        t_epoch = time.perf_counter()
        self.cache.reset_stats()
        self._epoch_h2d_bytes = 0
        tot_loss = tot_acc = 0.0
        nb = 0
        if not self._cache_filled:
            self._maybe_fill_cache()
        if self._is_cv:
            for mb, plan in self.loader.epoch():
                h_hist, agg_hist = self.cv_history.gather(mb)
                with self.timers.scope("step"):
                    self.state, metrics, new_hists = self.step_fn(
                        self.state, mb, plan, self.cache.cache_values,
                        h_hist, agg_hist,
                    )
                self.cv_history.scatter(mb, new_hists)
                tot_loss += float(metrics["loss"])
                tot_acc += float(metrics["acc"])
                nb += 1
                if self.log and nb % self.cfg.train.log_every == 0:
                    print(f"  step {nb}: loss={float(metrics['loss']):.4f}")
        else:
            # packed path: no host sync inside the epoch; metrics accumulate
            # on device and are fetched once at the end
            import dataclasses as _dc

            import jax.numpy as jnp
            acc_buf = jnp.zeros(3, dtype=jnp.float32)
            if self.device is not None:
                acc_buf = jax.device_put(acc_buf, self.device)
            K = getattr(self, "_group", 1)

            def put(x):
                return (jax.device_put(x, self.device)
                        if self.device is not None else jnp.asarray(x))

            def transfer(group):
                """Stack + H2D one group (runs on the transfer thread so it
                overlaps the previous group's dispatch/compute)."""
                layout0 = group[0][0]
                max_bucket = max(g[0].bucket for g in group)
                layout = _dc.replace(layout0, bucket=max_bucket)
                i32 = np.stack([g[1] for g in group])
                u8 = np.stack([g[2] for g in group])
                f32 = np.stack([
                    np.pad(g[3], ((0, max_bucket - g[3].shape[0]), (0, 0)))
                    if g[3].shape[0] < max_bucket else g[3]
                    for g in group
                ]) if max_bucket else np.zeros(
                    (len(group), 0, layout.total_dim),
                    group[0][3].dtype)
                self._epoch_h2d_bytes += (i32.nbytes + u8.nbytes
                                          + f32.nbytes)
                with self.timers.scope("h2d"):
                    return layout, put(i32), put(u8), put(f32)

            def dispatch(t):
                nonlocal acc_buf
                layout, i32d, u8d, f32d = t
                with self.timers.scope("step"):
                    self.state, acc_buf = self.multistep_fn(
                        layout, self.state, acc_buf, i32d, u8d, f32d,
                        self.cache.cache_values, self.cache.cache_map_dev,
                    )

            if K > 1:
                # device_put is async: transfer + dispatch inline already
                # pipelines against device compute of the previous group
                group = []
                for item in self.loader.epoch():
                    group.append(item)
                    nb += 1
                    if len(group) == K:
                        dispatch(transfer(group))
                        group = []
                if group:
                    dispatch(transfer(group))
            else:
                for layout, i32, u8, f32 in self.loader.epoch():
                    self._epoch_h2d_bytes += (i32.nbytes + u8.nbytes
                                              + f32.nbytes)
                    with self.timers.scope("step"):
                        self.state, acc_buf = self.step_fn(
                            layout, self.state, acc_buf, i32, u8, f32,
                            self.cache.cache_values, self.cache.cache_map_dev,
                        )
                    nb += 1
            if nb:
                vals = np.asarray(acc_buf)
                tot_loss, tot_acc = float(vals[0]), float(vals[1])
        if self._is_cv:
            with self.timers.scope("cv-refresh"):
                self.cv_history.refresh_agg()
        if (epoch == 0 and self.cfg.cache.enabled
                and self.cfg.cache.rank_by == "access_freq"
                and not self.cache.fully_cached):
            # refill by observed access frequency after the probe epoch
            # (online version of the reference's oracle, opt_cache_hit.py)
            self.cache.fill(capacity=self.cfg.cache.capacity,
                            rank_by="access_freq")
        em = EpochMetrics(
            epoch=epoch,
            mean_loss=tot_loss / max(nb, 1),
            mean_acc=tot_acc / max(nb, 1),
            time_s=time.perf_counter() - t_epoch,
            miss_rate=self.cache.miss_rate(),
            num_batches=nb,
            edges=self.loader.epoch_edges,
            vertices=self.loader.epoch_vertices,
            h2d_bytes=getattr(self, "_epoch_h2d_bytes", 0),
        )
        self.epoch_metrics.append(em)
        if self.log:
            print(
                f"epoch {epoch}: loss={em.mean_loss:.4f} acc={em.mean_acc:.3f} "
                f"time={em.time_s:.2f}s miss={em.miss_rate:.1%}"
            )
        return em

    def _dispatch_device_epoch(self, epoch: int):
        """Enqueue one epoch (async); returns the device metrics vector.
        No host array crosses the link: the accumulator is created inside
        jit and the key is derived on device."""
        key = jax.random.fold_in(self._epoch_key, epoch)
        if self._is_cv:
            (self.state, self._dev_hists, self._dev_aggs,
             acc) = self.epoch_fn(
                self.state, self._dev_hists, self._dev_aggs, key,
                self._dev_train_nids, self._dev_labels, self._dev_csr,
                self.cache.cache_values, self._dev_nbrs,
                self._dev_invdeg,
            )
            return acc
        if self._step_mode:
            # One async dispatch per minibatch: the host enqueues the whole
            # epoch without ever blocking (every input below is already
            # device-resident; the batch index comes from state.step ON
            # DEVICE), and the runtime overlaps dispatch i+1's
            # state-independent sample+gather with dispatch i's tail.
            seeds, smask, keys, acc = self._prepare_fn(
                key, self._dev_train_nids)
            for _ in range(self._num_batches):
                self.state, acc = self._step_fn(
                    self.state, acc, seeds, smask, keys, self._dev_labels,
                    self._dev_csr, self.cache.cache_values,
                )
            return acc
        if self._pipelined_mode:
            # Two async dispatches per minibatch; gather(i+1) is enqueued
            # BEFORE train(i) so the state-independent sample+gather of the
            # next batch overlaps the current batch's fwd/bwd (the phase
            # serialization a single chained program cannot hide — see
            # make_device_pipelined_fns).  Lookahead 1: two fused feature
            # buffers live at any time (the trained one is donated back).
            seeds, smask, keys, acc, counter = self._prepare_fn(
                key, self._dev_train_nids)
            counter, mb, fused = self._gather_fn(
                counter, seeds, smask, keys, self._dev_labels,
                self._dev_csr, self.cache.cache_values)
            for i in range(self._num_batches):
                cur_mb, cur_fused = mb, fused
                if i + 1 < self._num_batches:
                    counter, mb, fused = self._gather_fn(
                        counter, seeds, smask, keys, self._dev_labels,
                        self._dev_csr, self.cache.cache_values)
                self.state, acc = self._train_fn(
                    self.state, acc, cur_mb, cur_fused)
            return acc
        self.state, acc = self.epoch_fn(
            self.state, key, self._dev_train_nids,
            self._dev_labels, self._dev_csr, self.cache.cache_values,
        )
        return acc

    def _device_epoch_metrics(self, epoch: int, vals: np.ndarray,
                              time_s: float) -> EpochMetrics:
        steps = max(int(vals[2]), 1)
        em = EpochMetrics(
            epoch=epoch,
            mean_loss=float(vals[0]) / steps,
            mean_acc=float(vals[1]) / steps,
            time_s=time_s,
            miss_rate=0.0,                  # fully cached by construction
            num_batches=int(vals[2]),
            edges=int(vals[3]),
            vertices=int(vals[4]),
        )
        self.epoch_metrics.append(em)
        if self.log:
            print(
                f"epoch {epoch}: loss={em.mean_loss:.4f} "
                f"acc={em.mean_acc:.3f} time={em.time_s:.2f}s [on-device]"
            )
        return em

    def _run_epoch_on_device(self, epoch: int) -> EpochMetrics:
        """One compiled call per epoch; only the ~35ms metrics fetch (after
        the timer stops) touches the host link."""
        self._maybe_fill_cache()
        t_epoch = time.perf_counter()
        with self.timers.scope("step"):
            acc = self._dispatch_device_epoch(epoch)
            jax.block_until_ready(acc)      # epoch boundary, no transfer
        time_s = time.perf_counter() - t_epoch
        return self._device_epoch_metrics(epoch, np.asarray(acc), time_s)

    def _train_on_device(self, epochs: int, start_epoch: int) -> None:
        """Overlapped epoch dispatches: epoch e+1 is enqueued BEFORE epoch
        e's metrics are blocked on and fetched, so the ~35ms tunnel fetch
        rides under the next epoch's execution and the device never idles.
        (Fetching per epoch rather than one stacked fetch at the end also
        sidesteps an axon-tunnel wedge observed on deferred D2H reads after
        long donation chains.)"""
        self._maybe_fill_cache()
        prev = None
        prev_t = t0 = time.perf_counter()
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

    def _maybe_eval(self, epoch: int) -> None:
        """Validation accuracy via full-neighborhood inference every
        ``cfg.train.eval_every`` epochs (online version of the reference's
        offline checkpoint-replay eval, examples/eval.py:28-46)."""
        ev = self.cfg.train.eval_every
        if not (ev and self._eval_data) or (epoch + 1) % ev != 0:
            return
        from ..models.inference import evaluate

        graph, feats, labels, mask = self._eval_data
        params = jax.device_get(self.state.params)
        acc = evaluate(params, self.cfg.model, graph, feats, labels, mask,
                       backend=self.cfg.train.eval_backend)
        if self.epoch_metrics:
            self.epoch_metrics[-1].val_acc = acc
        if self.log:
            print(f"  [eval] epoch {epoch}: val acc {acc:.3f}")

    def train(self, epochs: Optional[int] = None, *, start_epoch: int = 0) -> Dict:
        if self._device_mode and not (self.cfg.train.ckpt_dir
                                      and self.cfg.train.ckpt_every
                                      ) and not self.cfg.train.eval_every:
            epochs = epochs or self.cfg.train.epochs
            self._train_on_device(epochs, start_epoch)
            return self.summary()
        return self._train_stepwise(epochs, start_epoch=start_epoch)

    def _cv_aux(self):
        """The gcn_cv control-variate histories as a checkpointable pytree
        (None for every other arch).  Host mode snapshots the CVHistory
        arrays; device mode the device-resident hist/agg stacks."""
        if not getattr(self, "_is_cv", False):
            return None
        if self._device_mode:
            return {"hist": list(self._dev_hists),
                    "agg": list(self._dev_aggs)}
        return {"hist": [np.asarray(h) for h in self.cv_history.hist],
                "agg": [np.asarray(a) for a in self.cv_history.agg]}

    def _restore_cv_aux(self, epoch: int) -> None:
        """Load CV histories saved next to the checkpoint.  Checkpoints
        written before aux saving resume with zero histories — the CV
        approximation degrades for ~one epoch until scatter/refresh repopulate
        them, so warn loudly instead of silently restarting (VERDICT r2 #6)."""
        from .checkpoint import restore_aux

        aux = restore_aux(self.cfg.train.ckpt_dir, self.cfg.model.arch,
                          epoch, self._cv_aux())
        if aux is None:
            import warnings
            warnings.warn(
                f"checkpoint {self.cfg.model.arch}_{epoch} has no .aux CV "
                "histories (pre-aux checkpoint?): resuming with ZERO "
                "hist/agg — the control-variate term is wrong until the "
                "first post-resume epoch refreshes them",
                RuntimeWarning, stacklevel=3)
            return
        if self._device_mode:
            import jax.numpy as jnp
            put = ((lambda x: jax.device_put(x, self.device))
                   if self.device is not None else jnp.asarray)
            self._dev_hists = tuple(put(h) for h in aux["hist"])
            self._dev_aggs = tuple(put(a) for a in aux["agg"])
        else:
            self.cv_history.hist = [np.asarray(h) for h in aux["hist"]]
            self.cv_history.agg = [np.asarray(a) for a in aux["agg"]]

    def resume(self, epoch: Optional[int] = None) -> int:
        """Restore train state from the newest (or given) checkpoint in
        ``cfg.train.ckpt_dir``; returns the epoch to continue from.  (The
        reference consumes checkpoints for eval only and cannot resume,
        SURVEY.md §5.)  gcn_cv restores its CV histories from the ``.aux``
        sidecar as well."""
        from .checkpoint import list_checkpoints, restore_checkpoint

        tc = self.cfg.train
        if not tc.ckpt_dir:
            raise ValueError("cfg.train.ckpt_dir is not set")
        have = list_checkpoints(tc.ckpt_dir, self.cfg.model.arch)
        if not have:
            return 0
        epoch = have[-1] if epoch is None else epoch
        self.state = restore_checkpoint(
            tc.ckpt_dir, self.cfg.model.arch, epoch, jax.device_get(self.state)
        )
        if self.device is not None:
            self.state = jax.device_put(self.state, self.device)
        if getattr(self, "_is_cv", False):
            self._restore_cv_aux(epoch)
        if getattr(self, "_step_mode", False):
            # epoch_dispatch="steps" derives the batch index from
            # state.step % num_batches ON device (device_epoch.py) — a
            # checkpoint taken off epoch boundaries would silently
            # misalign seeds/masks/keys.  One-time D2H fetch here (~34 ms
            # on axon) is the only place this check is free (ADVICE r3).
            step = int(jax.device_get(self.state.step))
            if step % self._num_batches != 0:
                raise ValueError(
                    f"epoch_dispatch='steps' requires epoch-aligned "
                    f"checkpoints: restored step {step} is not a multiple "
                    f"of num_batches={self._num_batches}")
        return epoch + 1

    def _train_stepwise(self, epochs: Optional[int] = None, *,
                        start_epoch: int = 0) -> Dict:
        epochs = epochs or self.cfg.train.epochs
        tc = self.cfg.train
        for e in range(start_epoch, epochs):
            self.run_epoch(e)
            self._maybe_eval(e)
            if tc.ckpt_dir and tc.ckpt_every and (e + 1) % tc.ckpt_every == 0:
                from .checkpoint import save_checkpoint
                save_checkpoint(tc.ckpt_dir, self.cfg.model.arch, e,
                                self.state, aux=self._cv_aux())
        return self.summary()

    def summary(self) -> Dict:
        """Mean epoch time excluding warm-up epochs (reference:
        pa_gcn.py:104-106 excludes the first 2)."""
        w = self.cfg.train.warmup_epochs
        steady = self.epoch_metrics[w:] or self.epoch_metrics
        val_accs = [m.val_acc for m in self.epoch_metrics
                    if m.val_acc is not None]
        return {
            "epochs": len(self.epoch_metrics),
            "mean_epoch_time_s": float(np.mean([m.time_s for m in steady])),
            "final_loss": self.epoch_metrics[-1].mean_loss if self.epoch_metrics else None,
            "final_acc": self.epoch_metrics[-1].mean_acc if self.epoch_metrics else None,
            "miss_rate": self.epoch_metrics[-1].miss_rate if self.epoch_metrics else None,
            "val_acc": val_accs[-1] if val_accs else None,
            "phase_timers": self.timers.summary(),
        }
