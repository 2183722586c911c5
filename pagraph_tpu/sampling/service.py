"""Isolation-mode sampling service: sampling in dedicated worker processes.

TPU-native re-design of the reference's remote-sampling pipeline
(reference: PaGraph/parallel/dataloader.py — ``SampleDeliver`` server-side
sampler processes, ``SampleLoader`` trainer-side receiver, ``SampleBarrier``
TCP flow control).  The reference isolates sampling CPU work in a separate
*server* process and streams serialized NodeFlows over loopback TCP
(port 8760+rank) with a 50-batch barrier window.  On a TPU host a single
process drives the chips, so isolation means: worker *processes* (true
parallelism past the GIL) sample into **shared-memory packed buffers**; the
trainer consumes them with zero deserialization; a bounded slot ring provides
the same backpressure the socket barrier did.

Dispatch modes (reference: one2one_sample / one2all_sample,
dataloader.py:107-172):
  * one2one — each consumer rank has its own worker(s) over its partition;
  * one2all — a worker pool samples the full graph's train set, round-robin
    to consumers (the cache_server.py baseline).

Workers never touch JAX; they run the native C++ sampler and write results
into preallocated SharedMemory slots.
"""
from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from dataclasses import dataclass
from multiprocessing import shared_memory
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from ..config import SamplerConfig
from ..graph import CSRGraph
from .block import MiniBatch
from .pack import BatchLayout, make_layout, pack

_STOP = None


def _share(arr: np.ndarray, registry: list) -> Tuple[str, tuple, str]:
    shm = shared_memory.SharedMemory(create=True, size=max(arr.nbytes, 1))
    view = np.ndarray(arr.shape, dtype=arr.dtype, buffer=shm.buf)
    view[:] = arr
    registry.append(shm)
    return shm.name, arr.shape, str(arr.dtype)


def _attach(spec, registry: list) -> np.ndarray:
    name, shape, dtype = spec
    shm = shared_memory.SharedMemory(name=name)
    registry.append(shm)
    return np.ndarray(shape, dtype=np.dtype(dtype), buffer=shm.buf)


def _worker_main(
    graph_spec: dict,
    config: SamplerConfig,
    caps: Tuple[int, ...],
    slot_spec: dict,
    task_q: mp.Queue,
    done_qs,
    seed: int,
):
    """Worker loop: task = (consumer, slot_id, seeds, batch_seed) ->
    sample into slot, report (slot_id, n_seeds) to that consumer's queue."""
    registry: list = []
    try:
        indptr = _attach(graph_spec["indptr"], registry)
        indices = _attach(graph_spec["indices"], registry)
        out_deg = np.zeros(len(indptr) - 1, dtype=np.int32)  # unused by sampler
        labels = (
            _attach(graph_spec["labels"], registry)
            if graph_spec.get("labels")
            else None
        )
        graph = CSRGraph(indptr=indptr, indices=indices, out_degrees=out_deg)
        from .native import NativeSampler

        sampler = NativeSampler(graph, config, caps)
        i32_slots = _attach(slot_spec["i32"], registry)
        u8_slots = _attach(slot_spec["u8"], registry)
        layout = make_layout(caps, config.block_fanouts(), 0, 0)
        while True:
            task = task_q.get()
            if task is _STOP:
                break
            consumer, slot_id, seeds, batch_seed = task
            mb = sampler.sample(seeds, labels, batch_seed)
            plan = _EMPTY_PLAN_CACHE.get(caps[0])
            if plan is None:
                plan = _empty_plan(caps[0])
                _EMPTY_PLAN_CACHE[caps[0]] = plan
            i32, u8, _ = pack(mb, plan, layout)
            i32_slots[slot_id, : len(i32)] = i32
            u8_slots[slot_id, : len(u8)] = u8
            done_qs[consumer].put((slot_id, len(seeds)))
    finally:
        for shm in registry:
            shm.close()


_EMPTY_PLAN_CACHE: dict = {}


def _empty_plan(cap0: int):
    from ..storage.cache import FetchPlan

    return FetchPlan(
        hit_mask=np.zeros(cap0, dtype=bool),
        cache_pos=np.zeros(cap0, dtype=np.int32),
        miss_slot=np.zeros(cap0, dtype=np.int32),
        miss_feats=np.zeros((0, 0), dtype=np.float32),
    )


class SampleService:
    """Sampling workers feeding one or more consumers.

    one2one (``num_consumers=1``, default): dedicated workers for a single
    consumer iterating :meth:`epoch` — the reference's per-trainer sampler
    processes (dataloader.py:150-172).

    one2all (``num_consumers=N``): ONE worker pool over ONE graph serves N
    consumers round-robin via :meth:`epoch_for` — the reference's shared
    sampler with round-robin dispatch and tail make-up sends
    (dataloader.py:113-147).  Each consumer has its own completion queue and
    slot range, so a slow consumer only backpressures its own window.

    MiniBatches are reconstructed as zero-copy views of shared-memory slots;
    ``num_slots`` bounds how far sampling runs ahead (the reference's
    50-batch barrier window, dataloader.py:17).
    """

    def __init__(
        self,
        graph: CSRGraph,
        train_nids: np.ndarray,
        config: SamplerConfig,
        *,
        labels: Optional[np.ndarray] = None,
        num_workers: int = 2,
        num_slots: int = 8,
        caps: Optional[Sequence[int]] = None,
        seed: int = 0,
        num_consumers: int = 1,
    ):
        self.num_consumers = num_consumers
        num_slots = num_slots * num_consumers
        self.config = config
        self.train_nids = np.asarray(train_nids, dtype=np.int64)
        self.caps = tuple(caps) if caps is not None else config.layer_capacities(graph.num_nodes)
        self.layout = make_layout(self.caps, config.block_fanouts(), 0, 0)
        self.num_slots = num_slots
        self._base_seed = seed
        self.rng = np.random.default_rng(seed)
        self._epoch_idx = [0] * num_consumers
        self._registry: list = []

        graph_spec = {
            "indptr": _share(graph.indptr, self._registry),
            "indices": _share(graph.indices, self._registry),
            "labels": _share(labels.astype(np.int64), self._registry) if labels is not None else None,
        }
        i32_shape = (num_slots, self.layout.i32_size)
        u8_shape = (num_slots, self.layout.u8_size)
        self._i32 = shared_memory.SharedMemory(
            create=True, size=int(np.prod(i32_shape)) * 4
        )
        self._u8 = shared_memory.SharedMemory(
            create=True, size=int(np.prod(u8_shape))
        )
        self.i32_slots = np.ndarray(i32_shape, dtype=np.int32, buffer=self._i32.buf)
        self.u8_slots = np.ndarray(u8_shape, dtype=np.uint8, buffer=self._u8.buf)
        slot_spec = {
            "i32": (self._i32.name, i32_shape, "int32"),
            "u8": (self._u8.name, u8_shape, "uint8"),
        }
        ctx = mp.get_context("spawn")   # workers must not inherit TPU state
        self._task_q = ctx.Queue()
        self._done_qs = [ctx.Queue() for _ in range(num_consumers)]
        self.workers = [
            ctx.Process(
                target=_worker_main,
                args=(graph_spec, config, self.caps, slot_spec,
                      self._task_q, self._done_qs, seed + w),
                daemon=True,
            )
            for w in range(num_workers)
        ]
        for w in self.workers:
            w.start()

    @property
    def num_batches(self) -> int:
        b = self.config.batch_size
        total = (len(self.train_nids) + b - 1) // b
        if self.num_consumers == 1:
            return total
        # one2all: every consumer gets the same step count; short consumers
        # are topped up with make-up batches (reference dataloader.py:138-143)
        return -(-total // self.num_consumers)

    def epoch(self) -> Iterator[MiniBatch]:
        return self.epoch_for(0)

    def _epoch_chunks(self, rank: int):
        """Round-robin chunk assignment; consumers short of the max step
        count re-draw make-up chunks from the shuffled pool.  All consumers
        derive the SAME per-epoch permutation (seeded by epoch index) so the
        round-robin split is disjoint even though they iterate concurrently."""
        ep = self._epoch_idx[rank]
        self._epoch_idx[rank] += 1
        rng = np.random.default_rng(
            np.random.SeedSequence((self._base_seed, ep))
        )
        order = rng.permutation(len(self.train_nids))
        nids = self.train_nids[order]
        b = self.config.batch_size
        chunks = [nids[i:i + b] for i in range(0, len(nids), b)]
        if self.num_consumers == 1:
            return chunks
        mine = chunks[rank::self.num_consumers]
        want = self.num_batches
        i = 0
        while len(mine) < want:
            mine.append(chunks[i % len(chunks)])
            i += 1
        return mine

    def epoch_for(self, rank: int) -> Iterator[MiniBatch]:
        # thread-local rng: consumers may iterate concurrently
        rng = np.random.default_rng(
            np.random.SeedSequence(
                (self._base_seed, rank, self._epoch_idx[rank], 7)
            )
        )
        chunks = self._epoch_chunks(rank)
        per = self.num_slots // self.num_consumers
        my_slots = list(range(rank * per, (rank + 1) * per))
        done_q = self._done_qs[rank]
        submitted = 0
        while my_slots and submitted < len(chunks):
            self._task_q.put((rank, my_slots.pop(), chunks[submitted],
                              int(rng.integers(0, 2**31 - 1))))
            submitted += 1
        received = 0
        while received < len(chunks):
            # liveness-checked wait: the reference blocks forever if a
            # sampler process dies (SURVEY.md §5 failure-detection gap)
            while True:
                try:
                    slot_id, _ = done_q.get(timeout=5.0)
                    break
                except queue_mod.Empty:
                    if not any(w.is_alive() for w in self.workers):
                        raise RuntimeError(
                            "all sampling workers died; check worker stderr"
                        )
            received += 1
            yield self._decode(slot_id)
            # slot free again only after the consumer moved on
            if submitted < len(chunks):
                self._task_q.put((rank, slot_id, chunks[submitted],
                                  int(rng.integers(0, 2**31 - 1))))
                submitted += 1

    def _decode(self, slot_id: int) -> MiniBatch:
        """Rebuild a MiniBatch as views over the shared slot (zero copy)."""
        from .pack import unpack_numpy

        return unpack_numpy(self.layout, self.i32_slots[slot_id],
                            self.u8_slots[slot_id])

    def close(self) -> None:
        for _ in self.workers:
            self._task_q.put(_STOP)
        for w in self.workers:
            w.join(timeout=5)
            if w.is_alive():
                w.terminate()
        for shm in self._registry + [self._i32, self._u8]:
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
