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
        workers: int = 2,
        host_output: bool = False,
    ):
        self.sampler = sampler
        self.cache = cache
        self.prefetch = max(1, prefetch)
        self.device = device
        self.packed = packed
        # producer threads: sampling happens under a lock (generators and the
        # native scratch map are not thread-safe) but fetch_plan/pack/
        # device_put run concurrently, pipelining H2D transfers.  Items carry
        # sequence numbers and the consumer reorders, so epoch order (and
        # therefore the training trajectory) stays deterministic.
        self.workers = max(1, workers)
        # host_output: skip device_put in the producers (the consumer groups
        # several batches into one transfer — see make_multistep_train_step)
        self.host_output = host_output
        # throughput accounting (reference counts loaded vertices per epoch,
        # examples/count_vnum.py:16-20; we also count sampled edges)
        self.epoch_edges = 0
        self.epoch_vertices = 0

    def _produce(self, q: queue.Queue, stop: threading.Event,
                 it, it_lock: threading.Lock, done_counter: list) -> None:
        try:
            while not stop.is_set():
                with it_lock:
                    try:
                        mb = next(it)
                    except StopIteration:
                        break
                    seq = done_counter[1]
                    done_counter[1] += 1
                    # sampler scratch + stat counters are shared: update here
                    self.epoch_edges += mb.num_sampled_edges()
                    self.epoch_vertices += mb.num_loaded_vertices()
                plan = self.cache.fetch_plan(
                    np.asarray(mb.input_nids), np.asarray(mb.input_mask)
                )
                # device_put from the producer thread: H2D overlaps compute
                if self.host_output:
                    put = lambda x: x
                elif self.device is not None:
                    put = lambda x: jax.device_put(x, self.device)
                else:
                    put = jnp.asarray
                if self.packed:
                    from .pack import make_layout, pack
                    layout = make_layout(
                        self.sampler.caps,
                        self.sampler.config.block_fanouts(),
                        self.cache.total_dim, plan.miss_feats.shape[0],
                        device_plan=True,
                    )
                    i32, u8, f32 = pack(mb, plan, layout)
                    q.put((seq, (layout, put(i32), put(u8), put(f32))))
                else:
                    mb_dev = jax.tree.map(put, mb)
                    plan_dev = jax.tree.map(put, plan)
                    q.put((seq, (mb_dev, plan_dev)))
            with it_lock:
                done_counter[0] += 1
                if done_counter[0] == self.workers:
                    q.put(_END)
        except BaseException as e:  # surface errors to the consumer
            q.put(e)

    def epoch(self) -> Iterator[Tuple[MiniBatch, FetchPlan]]:
        self.epoch_edges = 0
        self.epoch_vertices = 0
        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, self.workers))
        stop = threading.Event()
        it = self.sampler.epoch()
        it_lock = threading.Lock()
        done_counter = [0, 0]   # [workers finished, next sequence number]
        threads = [
            threading.Thread(
                target=self._produce,
                args=(q, stop, it, it_lock, done_counter),
                daemon=True,
            )
            for _ in range(self.workers)
        ]
        for t in threads:
            t.start()
        try:
            pending: dict = {}
            expect = 0
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                seq, payload = item
                pending[seq] = payload
                while expect in pending:
                    yield pending.pop(expect)
                    expect += 1
            while expect in pending:    # drain the reorder buffer
                yield pending.pop(expect)
                expect += 1
        finally:
            stop.set()
            # drain so producers can exit
            while any(t.is_alive() for t in threads):
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            for t in threads:
                t.join(timeout=5)

    def __iter__(self):
        return self.epoch()
