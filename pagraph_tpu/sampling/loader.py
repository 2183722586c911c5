"""Prefetching batch loader: overlap host sampling + feature fetch with
device compute.

TPU-native replacement for the reference's data-movement pipeline: where the
reference overlaps via sampler worker threads inside DGL plus non-blocking
cudaMemcpy of cache misses (storage.py:128, dataloader.py prefetch), here a
background thread pipelines [sample -> cache hit/miss split -> host gather ->
device_put] while the main thread runs the jitted step on the previous batch.
Depth-``prefetch`` bounded queue provides the backpressure the reference
implements with its 50-batch socket barrier (dataloader.py:17,59-60).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..storage.cache import FeatureCache, FetchPlan
from .block import MiniBatch
from .sampler import NeighborSampler

_END = object()


class PrefetchLoader:
    """Iterates (device MiniBatch, device FetchPlan) pairs for one epoch."""

    def __init__(
        self,
        sampler: NeighborSampler,
        cache: FeatureCache,
        *,
        prefetch: int = 2,
        device: Optional[jax.Device] = None,
        packed: bool = False,
    ):
        self.sampler = sampler
        self.cache = cache
        self.prefetch = max(1, prefetch)
        self.device = device
        self.packed = packed
        # throughput accounting (reference counts loaded vertices per epoch,
        # examples/count_vnum.py:16-20; we also count sampled edges)
        self.epoch_edges = 0
        self.epoch_vertices = 0

    def _produce(self, q: queue.Queue, stop: threading.Event) -> None:
        try:
            for mb in self.sampler.epoch():
                if stop.is_set():
                    break
                self.epoch_edges += mb.num_sampled_edges()
                self.epoch_vertices += int(
                    sum(np.asarray(m).sum() for m in mb.layer_mask)
                )
                plan = self.cache.fetch_plan(
                    np.asarray(mb.input_nids), np.asarray(mb.input_mask)
                )
                # device_put from the producer thread: H2D overlaps compute
                put = (
                    (lambda x: jax.device_put(x, self.device))
                    if self.device is not None
                    else jnp.asarray
                )
                if self.packed:
                    from .pack import make_layout, pack
                    layout = make_layout(
                        self.sampler.caps, self.sampler.config.fanout,
                        self.cache.total_dim, plan.miss_feats.shape[0],
                        device_plan=True,
                    )
                    i32, u8, f32 = pack(mb, plan, layout)
                    q.put((layout, put(i32), put(u8), put(f32)))
                else:
                    mb_dev = jax.tree.map(put, mb)
                    plan_dev = jax.tree.map(put, plan)
                    q.put((mb_dev, plan_dev))
            q.put(_END)
        except BaseException as e:  # surface errors to the consumer
            q.put(e)

    def epoch(self) -> Iterator[Tuple[MiniBatch, FetchPlan]]:
        self.epoch_edges = 0
        self.epoch_vertices = 0
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, stop), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)

    def __iter__(self):
        return self.epoch()
