"""Whole-epoch on-device training: shuffle + sample + train in ONE dispatch.

The reference's hot loop crosses the host/device boundary every minibatch —
C++ sampling, feature fetch, H2D copy, kernel launch (reference:
examples/profile/pa_gcn.py:82-109).  Here, when the CSR structure and the
full feature cache are HBM-resident, an *entire epoch* is a single compiled
call: the train-vertex permutation is drawn with ``jax.random`` on device, a
``lax.scan`` runs every minibatch (on-device sampling via
:mod:`pagraph_tpu.sampling.device_sampler`, feature gather straight from the
cache, forward/backward, Adam), and only a ~5-float metrics vector returns
to the host per epoch.

This is the end state of the perf playbook: the packed/multistep path
(train/state.py) amortizes host dispatches K-fold; this path removes them.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import get_model
from ..ops.gather import chunked_take
from ..storage.cache import dequantize_fused
from ..sampling.device_sampler import DeviceCSR, sample_minibatch_device
from .objective import masked_accuracy, masked_cross_entropy
from .state import TrainState, cast_apply, compute_dtype

# metrics accumulator layout (float32[5])
METRIC_NAMES = ("loss_sum", "acc_sum", "steps", "edges", "vertices")


def _make_batch_body(cfg: Config, tx: optax.GradientTransformation,
                     field_offsets: dict, dequant_scale=None) -> Callable:
    """The shared sample→gather→fwd/bwd→Adam body for ONE minibatch.

    Returns ``body(state, acc, seeds, smask, skey, labels, csr,
    cache_values) -> (state, acc)``.  Used by both the whole-epoch scan
    (:func:`make_device_epoch_fn`) and the per-step dispatch variant
    (:func:`make_device_step_fns`) so the two modes stay trajectory-identical
    by construction.
    """
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws
    if not cfg.sampler.include_self:
        raise ValueError("on-device sampling requires include_self=True")

    def body(state, acc, seeds, smask, skey, labels, csr, cache_values):
        mb = sample_minibatch_device(
            csr, seeds, smask, hops, fanout, skey, labels=labels,
            paired=paired,
        )
        rng, sub = jax.random.split(state.rng)
        fused = dequantize_fused(
            chunked_take(cache_values, mb.input_nids), dequant_scale)
        feats = fused[:, feat_slice]

        def loss_fn(params):
            kwargs = dict(train=True, dropout_rng=sub)
            if sage_pre:
                kwargs["neigh_feats"] = fused[:, neigh_slice]
            logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
            loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
        edges = sum(b.neigh_mask.sum() for b in mb.blocks)
        verts = sum(m.sum() for m in mb.layer_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        new_acc = acc + jnp.stack([
            loss, acc_v, jnp.ones((), loss.dtype),
            edges.astype(jnp.float32), verts.astype(jnp.float32),
        ])
        return new_state, new_acc

    return body


def _epoch_schedule(epoch_key, train_nids, batch_size):
    """Device-side epoch schedule: seeds [nb, B], mask [nb, B], keys [nb, ·].

    The tail batch is padded by wrapping the permutation, with padded seeds
    masked out of sampling, loss and metrics (shared by scan and per-step
    modes — identical draws ⇒ identical trajectories)."""
    n_train = train_nids.shape[0]
    num_batches = -(-n_train // batch_size)
    total = num_batches * batch_size
    perm_key, sample_key = jax.random.split(epoch_key)
    perm = jax.random.permutation(perm_key, n_train)
    idx = jnp.arange(total, dtype=jnp.int32)
    seeds_all = jnp.take(train_nids, jnp.take(perm, idx % n_train)
                         ).reshape(num_batches, batch_size)
    seed_mask_all = (idx < n_train).reshape(num_batches, batch_size)
    step_keys = jax.random.split(sample_key, num_batches)
    return seeds_all, seed_mask_all, step_keys


def make_device_epoch_fn(cfg: Config, tx: optax.GradientTransformation,
                         field_offsets: dict,
                         dequant_scale=None) -> Callable:
    """Build the jitted epoch function.

    Signature::

        epoch_fn(state, metrics_acc, epoch_key, train_nids, labels,
                 csr, cache_values) -> (state, metrics_acc)

    ``train_nids`` int32 [n_train] (device), ``labels`` int32 [N] per-vertex,
    ``csr`` a :class:`DeviceCSR`, ``cache_values`` the fully-cached
    ``[N, total_dim]`` feature block (identity residency map).  The number of
    minibatches is ``ceil(n_train / batch_size)``; the tail batch is padded
    by wrapping the permutation, with padded seeds masked out of sampling,
    loss and metrics.
    """
    body = _make_batch_body(cfg, tx, field_offsets, dequant_scale)
    B = cfg.sampler.batch_size
    paired = cfg.sampler.paired_draws

    @partial(jax.jit, donate_argnames=("state",))
    def epoch_fn(state: TrainState, epoch_key: jax.Array,
                 train_nids: jax.Array, labels: jax.Array, csr: DeviceCSR,
                 cache_values: jax.Array):
        # the metrics accumulator is CREATED here: a host-made buffer would
        # ride the tunnel H2D and stall the dispatch ~250ms on this machine
        metrics_acc = jnp.zeros(5, dtype=jnp.float32)
        if paired:
            csr = csr.with_rows()   # once per dispatch, OUTSIDE the scan
        seeds_all, seed_mask_all, step_keys = _epoch_schedule(
            epoch_key, train_nids, B)

        def one(carry, xs):
            state, acc = carry
            seeds, smask, skey = xs
            return body(state, acc, seeds, smask, skey, labels, csr,
                        cache_values), None

        (state, metrics_acc), _ = jax.lax.scan(
            one, (state, metrics_acc), (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )
        return state, metrics_acc

    return epoch_fn


def make_device_step_fns(cfg: Config, tx: optax.GradientTransformation,
                         field_offsets: dict,
                         dequant_scale=None) -> tuple:
    """Per-step dispatch variant of :func:`make_device_epoch_fn`.

    Measured outcome (BENCH_NOTES "per-step dispatch A/B", 2026-08-20):
    a small, perfectly stable win at the [15,10,5]/b1024/h256 leaderboard
    shape — 21.60 vs 22.16 ms/step (+2.6%), interleaved same-run — plus a
    2.6× faster warm-up (the per-step program is ~636× smaller than the
    whole-epoch scan: 58 s vs 152 s compile+first-epoch).  The experiment
    also settles dead-end #2: the 16.9 ms/step "independent dispatches"
    figure was mostly the missing state chain (un-chained dispatches
    overlap each other's compute; the real chained epoch cannot), so the
    scan-vs-dispatch gap is dependency-structure, not dispatch overhead.
    ``scan`` stays the default (`TrainConfig.epoch_dispatch`): at small
    step shapes (~1.4 ms) per-dispatch overhead would dominate.

    Returns ``(prepare_fn, step_fn)``::

        seeds, mask, keys, acc = prepare_fn(epoch_key, train_nids)
        for _ in range(num_batches):
            state, acc = step_fn(state, acc, seeds, mask, keys,
                                 labels, csr, cache_values)

    Every per-dispatch input is device-resident (the batch index is derived
    from ``state.step`` ON DEVICE), so no host array rides the tunnel inside
    an epoch — the same zero-H2D contract as the scan path.  INVARIANT:
    ``state.step`` must be a multiple of ``num_batches`` at every epoch
    start (epoch-granular training preserves this; ``Trainer.resume``
    rejects non-epoch-aligned checkpoints in step mode).  The schedule
    builder is shared with the scan path, so the two modes are
    trajectory-identical (tests/test_step_dispatch.py pins this).

    ``csr`` must already have its paired row view materialized
    (``DeviceCSR.with_rows()`` OUTSIDE jit, once) when
    ``sampler.paired_draws`` — reshaping per dispatch would re-tile the
    [E/8, 8] table every step (the 6.8M-edges/s regression, CLAUDE.md).
    """
    body = _make_batch_body(cfg, tx, field_offsets, dequant_scale)
    B = cfg.sampler.batch_size

    @jax.jit
    def prepare_fn(epoch_key: jax.Array, train_nids: jax.Array):
        seeds_all, seed_mask_all, step_keys = _epoch_schedule(
            epoch_key, train_nids, B)
        return seeds_all, seed_mask_all, step_keys, jnp.zeros(
            5, dtype=jnp.float32)

    @partial(jax.jit, donate_argnames=("state", "acc"))
    def step_fn(state: TrainState, acc: jax.Array, seeds_all: jax.Array,
                seed_mask_all: jax.Array, step_keys: jax.Array,
                labels: jax.Array, csr: DeviceCSR, cache_values: jax.Array):
        num_batches = seeds_all.shape[0]
        i = jax.lax.rem(state.step, jnp.int32(num_batches))
        seeds = jax.lax.dynamic_index_in_dim(seeds_all, i, keepdims=False)
        smask = jax.lax.dynamic_index_in_dim(seed_mask_all, i,
                                             keepdims=False)
        skey = jax.lax.dynamic_index_in_dim(step_keys, i, keepdims=False)
        return body(state, acc, seeds, smask, skey, labels, csr,
                    cache_values)

    return prepare_fn, step_fn


def make_device_pipelined_fns(cfg: Config, tx: optax.GradientTransformation,
                              field_offsets: dict,
                              dequant_scale=None) -> tuple:
    """Split-dispatch pipelined epoch: per minibatch, one STATE-INDEPENDENT
    ``gather_fn`` dispatch (sample + feature gather — driven purely by the
    precomputed seed/key schedule and a device-side batch counter) and one
    state-chained ``train_fn`` dispatch (fwd/bwd/Adam/metrics).

    Built to attack the ~3 ms/step of apparent phase serialization at the
    [15,10,5]/b1024/h256 leaderboard shape (VERDICT r3 #3, BENCH_NOTES
    "DCE-proof attribution"): sample+gather are key-driven and state-
    independent, so splitting them into their own dispatch enqueued one
    batch ahead *would* overlap them with the previous batch's fwd/bwd —
    IF the runtime overlapped adjacent enqueued programs.

    **Measured outcome (2026-08-20, BENCH_NOTES "pipelining dead end,
    settled"): it does not.**  This mode runs 23.9 ms/step vs 21.6 for
    ``steps``/``scan`` at the leaderboard shape — execution across
    dispatches is serial, so the split only adds the fused-buffer
    materialization and a second dispatch per batch.  A two-rail
    delayed-gradient probe (two alternating optimizer states, adjacent
    dispatches FULLY independent — the strongest possible decoupling)
    measured 21.66 vs 21.64 ms/step: no overlap exists to unlock, and the
    earlier 15.5–17.6 ms "independent dispatches" band was a harness
    artifact.  ~21.6 ms/step is the genuine serial floor for this shape.
    The mode is kept as a correct, tested, honestly-documented record of
    the experiment (trajectory bit-identical to ``scan``/``steps`` — same
    schedule builder, same rng handling, pinned by
    tests/test_step_dispatch.py); it is NOT recommended for production.

    Returns ``(prepare_fn, gather_fn, train_fn)``::

        seeds, mask, keys, acc, counter = prepare_fn(epoch_key, train_nids)
        counter, batch = gather_fn(counter, seeds, mask, keys, labels,
                                   csr, cache_values)
        state, acc = train_fn(state, acc, *batch)

    ``batch`` is ``(mb, fused)``; ``fused`` (the assembled feature block,
    the one large buffer) is donated into ``train_fn``, so at lookahead 1
    exactly two fused buffers are ever live.  ``csr`` must have its paired
    row view materialized outside jit (as in ``steps`` mode).
    """
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws
    if not cfg.sampler.include_self:
        raise ValueError("on-device sampling requires include_self=True")

    @jax.jit
    def prepare_fn(epoch_key: jax.Array, train_nids: jax.Array):
        seeds_all, seed_mask_all, step_keys = _epoch_schedule(
            epoch_key, train_nids, B)
        return (seeds_all, seed_mask_all, step_keys,
                jnp.zeros(5, dtype=jnp.float32),
                jnp.zeros((), dtype=jnp.int32))

    @partial(jax.jit, donate_argnames=("counter",))
    def gather_fn(counter: jax.Array, seeds_all: jax.Array,
                  seed_mask_all: jax.Array, step_keys: jax.Array,
                  labels: jax.Array, csr: DeviceCSR, cache_values: jax.Array):
        num_batches = seeds_all.shape[0]
        i = jax.lax.rem(counter, jnp.int32(num_batches))
        seeds = jax.lax.dynamic_index_in_dim(seeds_all, i, keepdims=False)
        smask = jax.lax.dynamic_index_in_dim(seed_mask_all, i,
                                             keepdims=False)
        skey = jax.lax.dynamic_index_in_dim(step_keys, i, keepdims=False)
        mb = sample_minibatch_device(
            csr, seeds, smask, hops, fanout, skey, labels=labels,
            paired=paired,
        )
        fused = dequantize_fused(
            chunked_take(cache_values, mb.input_nids), dequant_scale)
        return counter + 1, mb, fused

    @partial(jax.jit, donate_argnames=("state", "acc", "fused"))
    def train_fn(state: TrainState, acc: jax.Array, mb, fused: jax.Array):
        rng, sub = jax.random.split(state.rng)
        feats = fused[:, feat_slice]

        def loss_fn(params):
            kwargs = dict(train=True, dropout_rng=sub)
            if sage_pre:
                kwargs["neigh_feats"] = fused[:, neigh_slice]
            logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
            loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
        edges = sum(b.neigh_mask.sum() for b in mb.blocks)
        verts = sum(m.sum() for m in mb.layer_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        new_acc = acc + jnp.stack([
            loss, acc_v, jnp.ones((), loss.dtype),
            edges.astype(jnp.float32), verts.astype(jnp.float32),
        ])
        return new_state, new_acc

    return prepare_fn, gather_fn, train_fn


def make_dp_device_epoch_fn(cfg: Config, tx: optax.GradientTransformation,
                            mesh, field_offsets: dict, num_batches: int,
                            axis: str = "dp",
                            dequant_scale=None) -> Callable:
    """Multi-chip whole-epoch on-device training.

    Each mesh coordinate owns one self-reliant partition: its CSR, full
    feature cache, train ids and labels live in that chip's HBM, stacked on a
    leading device axis.  Inside ``shard_map`` every chip shuffles and
    samples its own partition per step and gradients are ``pmean``-ed over
    ICI — the reference's whole process topology (sampler procs + shared-mem
    store + DDP, SURVEY.md §1) collapses into one compiled call per epoch.

    ``num_batches`` is the lockstep step count, ``max_r ceil(n_train_r/B)``;
    chips with fewer train vertices wrap around their permutation (the
    reference's "make-up" sends, parallel/dataloader.py:138-143).

    Signature (all array args stacked [D, ...], sharded over ``axis``;
    ``state``/``metrics_acc``/``epoch_key`` replicated)::

        epoch_fn(state, metrics_acc, epoch_key, train_nids, train_counts,
                 labels, indptr, indices, cache_values) -> (state, acc)
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws
    if not cfg.sampler.include_self:
        raise ValueError("on-device sampling requires include_self=True")

    def per_device_epoch(state: TrainState, epoch_key: jax.Array,
                         train_nids: jax.Array, train_count: jax.Array,
                         labels: jax.Array, indptr: jax.Array,
                         indices: jax.Array, ptr_pairs: jax.Array,
                         rows: jax.Array, cache_values: jax.Array):
        metrics_acc = jnp.zeros(5, dtype=jnp.float32)
        # drop the size-1 leading device axis inside the shard
        train_nids, train_count = train_nids[0], train_count[0]
        labels, cache_values = labels[0], cache_values[0]
        # ptr_pairs/rows are HOST-built arguments: deriving them in-jit
        # gives the narrow-minor-dim outputs a T(8,128)-tiled (padded)
        # layout — 16-64x the logical HBM at scale (the rmat25 lesson)
        csr = DeviceCSR(indptr=indptr[0], indices=indices[0],
                        ptr_pairs=ptr_pairs[0],
                        indices_rows=rows[0] if paired else None)
        rank = jax.lax.axis_index(axis)
        key = jax.random.fold_in(epoch_key, rank)
        perm_key, sample_key = jax.random.split(key)
        # permute the VALID prefix of the padded train-id vector: invalid
        # slots get +inf sort keys, so valid ids land in a random order at
        # the front
        max_train = train_nids.shape[0]
        u = jax.random.uniform(perm_key, (max_train,))
        u = jnp.where(jnp.arange(max_train) < train_count, u, jnp.inf)
        perm = jnp.argsort(u)
        idx = jnp.arange(num_batches * B, dtype=jnp.int32)
        wrapped = jnp.take(perm, idx % jnp.maximum(train_count, 1))
        seeds_all = jnp.take(train_nids, wrapped).reshape(num_batches, B)
        # wrap-around make-up seeds stay VALID (they are real training
        # batches, as in the reference); only chips with zero train
        # vertices mask everything
        seed_mask_all = jnp.broadcast_to(
            train_count > 0, (num_batches * B,)
        ).reshape(num_batches, B)
        step_keys = jax.random.split(sample_key, num_batches)

        def one(carry, xs):
            state, acc = carry
            seeds, smask, skey = xs
            mb = sample_minibatch_device(
                csr, seeds, smask, hops, fanout, skey, labels=labels,
                paired=paired,
            )
            rng, sub = jax.random.split(state.rng)
            sub = jax.random.fold_in(sub, rank)
            fused = dequantize_fused(
                chunked_take(cache_values, mb.input_nids), dequant_scale)
            feats = fused[:, feat_slice]

            def loss_fn(params):
                kwargs = dict(train=True, dropout_rng=sub)
                if sage_pre:
                    kwargs["neigh_feats"] = fused[:, neigh_slice]
                logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
                loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
                return loss, logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
            edges = sum(b.neigh_mask.sum() for b in mb.blocks)
            verts = sum(m.sum() for m in mb.layer_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = acc + jnp.stack([
                jax.lax.pmean(loss, axis),
                jax.lax.pmean(acc_v, axis),
                jnp.ones((), loss.dtype),
                jax.lax.psum(edges.astype(jnp.float32), axis),
                jax.lax.psum(verts.astype(jnp.float32), axis),
            ])
            return (new_state, new_acc), None

        (state, metrics_acc), _ = jax.lax.scan(
            one, (state, metrics_acc),
            (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )
        return state, metrics_acc

    def epoch(state, epoch_key, train_nids, train_counts, labels, indptr,
              indices, ptr_pairs, rows, cache_values):
        fn = shard_map(
            per_device_epoch,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, epoch_key, train_nids, train_counts,
                  labels, indptr, indices, ptr_pairs, rows, cache_values)

    return jax.jit(epoch, donate_argnames=("state",))


def make_ici_device_epoch_fn(cfg: Config, tx: optax.GradientTransformation,
                             mesh, field_offsets: dict, num_batches: int,
                             shard_rows: int, halo_width: int,
                             axis: str = "dp",
                             dequant_scale=None) -> Callable:
    """On-device sampling over the FULL graph + ICI-sharded features.

    The memory-scalable multi-chip mode: every chip replicates the (cheap)
    CSR structure and samples its slice of a SHARED per-epoch permutation of
    the global train set, while the (expensive) feature matrix is sharded
    disjointly across the mesh's HBM — layer-0 features are fetched from
    their owner chips with the two-``all_to_all`` halo exchange
    (parallel/halo.py), built in-jit by ``device_halo_plan``.  Per-chip HBM
    holds N*dim/D features instead of N*dim, and still nothing crosses the
    host link inside an epoch.

    ``num_batches`` = ceil(n_train / (D * batch)) lockstep steps per chip.
    Metrics accumulator is float32[6]: the usual 5 plus halo-dropped
    vertices (requests beyond the static halo width read zero features).

    Signature (replicated unless noted)::

        epoch_fn(state, metrics_acc, epoch_key, train_nids, labels,
                 indptr, indices, feat_shards[D-sharded]) -> (state, acc)
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..parallel.halo import device_halo_plan, exchange_features

    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws
    D = mesh.devices.size
    if not cfg.sampler.include_self:
        raise ValueError("on-device sampling requires include_self=True")

    def per_device_epoch(state: TrainState, epoch_key: jax.Array,
                         train_nids: jax.Array, labels: jax.Array,
                         indptr: jax.Array, indices: jax.Array,
                         ptr_pairs: jax.Array, rows: jax.Array,
                         feat_shard: jax.Array):
        metrics_acc = jnp.zeros(6, dtype=jnp.float32)
        # host-built ptr_pairs/rows: see make_dp_device_epoch_fn
        csr = DeviceCSR(indptr=indptr, indices=indices,
                        ptr_pairs=ptr_pairs,
                        indices_rows=rows if paired else None)
        feat_shard = feat_shard[0]            # [shard_rows, dim] my slice
        rank = jax.lax.axis_index(axis)
        # SHARED permutation (same replicated key on every chip): chip r
        # trains column r of the [steps, D, B] seed grid - the reference's
        # one2all round-robin dispatch (dataloader.py:126-147), minus the
        # sockets.
        perm_key, sample_key = jax.random.split(epoch_key)
        n_train = train_nids.shape[0]
        total = num_batches * D * B
        perm = jax.random.permutation(perm_key, n_train)
        idx = jnp.arange(total, dtype=jnp.int32)
        seeds_grid = jnp.take(train_nids, jnp.take(perm, idx % n_train)
                              ).reshape(num_batches, D, B)
        mask_grid = (idx < n_train).reshape(num_batches, D, B)
        seeds_all = jax.lax.dynamic_index_in_dim(
            seeds_grid, rank, axis=1, keepdims=False)
        seed_mask_all = jax.lax.dynamic_index_in_dim(
            mask_grid, rank, axis=1, keepdims=False)
        step_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, rank)
        )(jax.random.split(sample_key, num_batches))

        def one(carry, xs):
            state, acc = carry
            seeds, smask, skey = xs
            mb = sample_minibatch_device(
                csr, seeds, smask, hops, fanout, skey, labels=labels,
                paired=paired,
            )
            rng, sub = jax.random.split(state.rng)
            sub = jax.random.fold_in(sub, rank)
            plan = device_halo_plan(mb.input_nids, mb.input_mask,
                                    shard_rows, D, halo_width)
            fused = dequantize_fused(
                exchange_features(feat_shard, plan, axis), dequant_scale)
            feats = fused[:, feat_slice]
            drops = (jnp.logical_and(mb.input_mask, ~plan.valid)
                     ).sum().astype(jnp.float32)

            def loss_fn(params):
                kwargs = dict(train=True, dropout_rng=sub)
                if sage_pre:
                    kwargs["neigh_feats"] = fused[:, neigh_slice]
                logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
                loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
                return loss, logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
            edges = sum(b.neigh_mask.sum() for b in mb.blocks)
            verts = sum(m.sum() for m in mb.layer_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = acc + jnp.stack([
                jax.lax.pmean(loss, axis),
                jax.lax.pmean(acc_v, axis),
                jnp.ones((), loss.dtype),
                jax.lax.psum(edges.astype(jnp.float32), axis),
                jax.lax.psum(verts.astype(jnp.float32), axis),
                jax.lax.psum(drops, axis),
            ])
            return (new_state, new_acc), None

        (state, metrics_acc), _ = jax.lax.scan(
            one, (state, metrics_acc),
            (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )
        return state, metrics_acc

    def epoch(state, epoch_key, train_nids, labels, indptr, indices,
              ptr_pairs, rows, feat_shards):
        fn = shard_map(
            per_device_epoch,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, epoch_key, train_nids, labels,
                  indptr, indices, ptr_pairs, rows, feat_shards)

    return jax.jit(epoch, donate_argnames=("state",))


def make_edge_device_epoch_fn(cfg: Config, tx: optax.GradientTransformation,
                              mesh, field_offsets: dict, num_batches: int,
                              shard_rows: int, halo_width: int,
                              axis: str = "dp",
                              dequant_scale=None) -> Callable:
    """EDGE-PARTITIONED on-device training: per-chip partition CSR +
    ICI-sharded features — the memory-scalable composition of
    :func:`make_dp_device_epoch_fn` (each chip samples ITS self-reliant
    dg/hash partition, the reference's data layout,
    /root/reference/PaGraph/partition/dg.py:59-103 generalized) and
    :func:`make_ici_device_epoch_fn` (features sharded disjointly across
    the mesh, layer-0 rows fetched from owner chips with the two-
    ``all_to_all`` halo exchange).  Per-chip HBM drops to ~E/P structure +
    N*dim/P features — the only route to BASELINE configs #4/#5 — and
    still nothing crosses the host link inside an epoch.

    The partition CSR is in LOCAL vertex ids; ``local2full`` [D, max_n]
    maps each chip's layer-0 ids to full-graph ids for the (cyclic,
    ``owner(v) = v % P``) feature exchange.  Metrics acc float32[6]
    (5 usual + halo drops), lockstep ``num_batches`` with wrap-around
    make-up batches like the dp mode.

    With ``cfg.train.halo_pipeline`` the scan is software-pipelined one
    batch deep: step i samples and halo-exchanges batch i+1 while running
    batch i's fwd/bwd — the ``all_to_all`` becomes dataflow-independent of
    the compute, so XLA's latency-hiding scheduler can overlap ICI with
    MXU work (SURVEY §7 "all-to-all halo overlapped with local
    aggregation").  The trajectory is identical to the unpipelined epoch
    (same per-batch sample keys, same step order).

    Signature (stacked [D, ...] args sharded over ``axis``; ``state`` and
    ``epoch_key`` replicated)::

        epoch_fn(state, epoch_key, train_nids, train_counts, labels,
                 indptr, indices, local2full, feat_shards) -> (state, acc)
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..parallel.halo import device_halo_plan, exchange_features

    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws
    D = mesh.devices.size
    if not cfg.sampler.include_self:
        raise ValueError("on-device sampling requires include_self=True")

    def per_device_epoch(state: TrainState, epoch_key: jax.Array,
                         train_nids: jax.Array, train_count: jax.Array,
                         labels: jax.Array, indptr: jax.Array,
                         indices: jax.Array, ptr_pairs: jax.Array,
                         rows: jax.Array, local2full: jax.Array,
                         feat_shard: jax.Array):
        metrics_acc = jnp.zeros(6, dtype=jnp.float32)
        train_nids, train_count = train_nids[0], train_count[0]
        labels, local2full = labels[0], local2full[0]
        feat_shard = feat_shard[0]
        # host-built ptr_pairs/rows: see make_dp_device_epoch_fn
        csr = DeviceCSR(indptr=indptr[0], indices=indices[0],
                        ptr_pairs=ptr_pairs[0],
                        indices_rows=rows[0] if paired else None)
        rank = jax.lax.axis_index(axis)
        key = jax.random.fold_in(epoch_key, rank)
        perm_key, sample_key = jax.random.split(key)
        max_train = train_nids.shape[0]
        u = jax.random.uniform(perm_key, (max_train,))
        u = jnp.where(jnp.arange(max_train) < train_count, u, jnp.inf)
        perm = jnp.argsort(u)
        idx = jnp.arange(num_batches * B, dtype=jnp.int32)
        wrapped = jnp.take(perm, idx % jnp.maximum(train_count, 1))
        seeds_all = jnp.take(train_nids, wrapped).reshape(num_batches, B)
        seed_mask_all = jnp.broadcast_to(
            train_count > 0, (num_batches * B,)
        ).reshape(num_batches, B)
        step_keys = jax.random.split(sample_key, num_batches)

        def sample_and_fetch(seeds, smask, skey):
            mb = sample_minibatch_device(
                csr, seeds, smask, hops, fanout, skey, labels=labels,
                paired=paired,
            )
            # local layer-0 ids -> full-graph ids -> owner-chip fetch
            full_ids = jnp.take(local2full, mb.input_nids)
            plan = device_halo_plan(full_ids, mb.input_mask,
                                    shard_rows, D, halo_width)
            fused = dequantize_fused(
                exchange_features(feat_shard, plan, axis), dequant_scale)
            drops = (jnp.logical_and(mb.input_mask, ~plan.valid)
                     ).sum().astype(jnp.float32)
            return mb, fused, drops

        def train_one(state, acc, batch):
            mb, fused, drops = batch
            rng, sub = jax.random.split(state.rng)
            sub = jax.random.fold_in(sub, rank)
            feats = fused[:, feat_slice]

            def loss_fn(params):
                kwargs = dict(train=True, dropout_rng=sub)
                if sage_pre:
                    kwargs["neigh_feats"] = fused[:, neigh_slice]
                logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
                loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
                return loss, logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
            edges = sum(b.neigh_mask.sum() for b in mb.blocks)
            verts = sum(m.sum() for m in mb.layer_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = acc + jnp.stack([
                jax.lax.pmean(loss, axis),
                jax.lax.pmean(acc_v, axis),
                jnp.ones((), loss.dtype),
                jax.lax.psum(edges.astype(jnp.float32), axis),
                jax.lax.psum(verts.astype(jnp.float32), axis),
                jax.lax.psum(drops, axis),
            ])
            return new_state, new_acc

        if cfg.train.halo_pipeline and num_batches > 1:
            # one-deep software pipeline: the carried batch is computed
            # while the NEXT batch's sample + all_to_all runs — both live
            # in the same scan step but share no dataflow, so the
            # scheduler may overlap them
            def one_p(carry, xs):
                state, acc, batch = carry
                seeds, smask, skey = xs
                nxt = sample_and_fetch(seeds, smask, skey)
                state, acc = train_one(state, acc, batch)
                return (state, acc, nxt), None

            first = sample_and_fetch(seeds_all[0], seed_mask_all[0],
                                     step_keys[0])
            (state, metrics_acc, last), _ = jax.lax.scan(
                one_p, (state, metrics_acc, first),
                (seeds_all[1:], seed_mask_all[1:], step_keys[1:]),
                unroll=cfg.train.scan_unroll,
            )
            state, metrics_acc = train_one(state, metrics_acc, last)
            return state, metrics_acc

        def one(carry, xs):
            state, acc = carry
            seeds, smask, skey = xs
            batch = sample_and_fetch(seeds, smask, skey)
            state, acc = train_one(state, acc, batch)
            return (state, acc), None

        (state, metrics_acc), _ = jax.lax.scan(
            one, (state, metrics_acc),
            (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )
        return state, metrics_acc

    def epoch(state, epoch_key, train_nids, train_counts, labels, indptr,
              indices, ptr_pairs, rows, local2full, feat_shards):
        fn = shard_map(
            per_device_epoch,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, epoch_key, train_nids, train_counts,
                  labels, indptr, indices, ptr_pairs, rows, local2full,
                  feat_shards)

    return jax.jit(epoch, donate_argnames=("state",))


def make_dp_cv_device_epoch_fn(cfg: Config, tx: optax.GradientTransformation,
                               mesh, field_offsets: dict, num_batches: int,
                               max_nodes: int, axis: str = "dp",
                               dequant_scale=None) -> Callable:
    """Multi-chip whole-epoch control-variate GCN (gcn_cvsc.py semantics).

    The dp composition of :func:`make_dp_device_epoch_fn` (per-partition
    sampling, pmean'd grads) and :func:`make_cv_device_epoch_fn` (device-
    resident per-layer history/aggregated-history state): each chip owns the
    histories of ITS partition's local vertex space [max_nodes, w] and
    refreshes them against its own padded edge list at epoch end.  Histories
    are local state — no collective touches them; only gradients and
    metrics cross ICI.

    Signature (stacked [D, ...] args sharded over ``axis``; ``state`` and
    ``epoch_key`` replicated; ``hists``/``aggs`` tuples of [D, max_nodes, w])::

        epoch_fn(state, hists, aggs, epoch_key, train_nids, train_counts,
                 labels, indptr, indices, cache_values, edge_src, edge_dst,
                 inv_deg) -> (state, hists, aggs, acc)
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..models import gcn_cv
    from .state import cast_cv_apply

    cv_apply = cast_cv_apply(gcn_cv.apply, compute_dtype(cfg))
    feat_slice = field_offsets["features"]
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws

    def per_device_epoch(state, epoch_key, hists, aggs, train_nids,
                         train_count, labels, indptr, indices, ptr_pairs,
                         rows, cache_values, edge_src, edge_dst, inv_deg):
        metrics_acc = jnp.zeros(5, dtype=jnp.float32)
        train_nids, train_count = train_nids[0], train_count[0]
        labels, cache_values = labels[0], cache_values[0]
        hists = tuple(h[0] for h in hists)
        aggs = tuple(a[0] for a in aggs)
        edge_src, edge_dst, inv_deg = edge_src[0], edge_dst[0], inv_deg[0]
        # host-built ptr_pairs/rows: see make_dp_device_epoch_fn
        csr = DeviceCSR(indptr=indptr[0], indices=indices[0],
                        ptr_pairs=ptr_pairs[0],
                        indices_rows=rows[0] if paired else None)
        rank = jax.lax.axis_index(axis)
        key = jax.random.fold_in(epoch_key, rank)
        perm_key, sample_key = jax.random.split(key)
        max_train = train_nids.shape[0]
        u = jax.random.uniform(perm_key, (max_train,))
        u = jnp.where(jnp.arange(max_train) < train_count, u, jnp.inf)
        perm = jnp.argsort(u)
        idx = jnp.arange(num_batches * B, dtype=jnp.int32)
        wrapped = jnp.take(perm, idx % jnp.maximum(train_count, 1))
        seeds_all = jnp.take(train_nids, wrapped).reshape(num_batches, B)
        seed_mask_all = jnp.broadcast_to(
            train_count > 0, (num_batches * B,)
        ).reshape(num_batches, B)
        step_keys = jax.random.split(sample_key, num_batches)

        def one(carry, xs):
            state, hists, aggs, acc = carry
            seeds, smask, skey = xs
            mb = sample_minibatch_device(
                csr, seeds, smask, hops, fanout, skey, labels=labels,
                paired=paired,
            )
            rng, sub = jax.random.split(state.rng)
            sub = jax.random.fold_in(sub, rank)
            fused = dequantize_fused(
                chunked_take(cache_values, mb.input_nids), dequant_scale)
            feats = fused[:, feat_slice]
            h_hist = [jnp.take(hists[b], mb.layer_nids[b], axis=0)
                      for b in range(hops)]
            agg_hist = [jnp.take(aggs[b], mb.layer_nids[b + 1], axis=0)
                        for b in range(hops)]

            def loss_fn(params):
                logits, new_hists = cv_apply(
                    params, cfg.model, mb, feats, train=True,
                    dropout_rng=sub, h_hist=h_hist, agg_hist=agg_hist,
                )
                loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
                return loss, (logits, new_hists)

            (loss, (logits, new_hists)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            hists = list(hists)
            for b, nh in enumerate(new_hists):
                ids = jnp.where(mb.layer_mask[b], mb.layer_nids[b],
                                jnp.int32(max_nodes))
                hists[b] = hists[b].at[ids].set(nh, mode="drop")
            acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
            edges = sum(b.neigh_mask.sum() for b in mb.blocks)
            verts = sum(m.sum() for m in mb.layer_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = acc + jnp.stack([
                jax.lax.pmean(loss, axis),
                jax.lax.pmean(acc_v, axis),
                jnp.ones((), loss.dtype),
                jax.lax.psum(edges.astype(jnp.float32), axis),
                jax.lax.psum(verts.astype(jnp.float32), axis),
            ])
            return (new_state, tuple(hists), aggs, new_acc), None

        (state, hists, aggs, metrics_acc), _ = jax.lax.scan(
            one, (state, hists, aggs, metrics_acc),
            (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )

        def refresh(hist):
            def step(accum, xs):
                s, d = xs
                return accum.at[d].add(jnp.take(hist, s, axis=0),
                                       mode="drop"), None
            init = jnp.zeros_like(hist)
            summed, _ = jax.lax.scan(step, init, (edge_src, edge_dst))
            return summed * inv_deg[:, None]

        aggs = tuple(refresh(h) for h in hists)
        return (state, tuple(h[None] for h in hists),
                tuple(a[None] for a in aggs), metrics_acc)

    def epoch(state, hists, aggs, epoch_key, train_nids, train_counts,
              labels, indptr, indices, ptr_pairs, rows, cache_values,
              edge_src, edge_dst, inv_deg):
        fn = shard_map(
            per_device_epoch,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis)),
            out_specs=(P(), P(axis), P(axis), P()),
            check_vma=False,
        )
        return fn(state, epoch_key, hists, aggs, train_nids, train_counts,
                  labels, indptr, indices, ptr_pairs, rows, cache_values,
                  edge_src, edge_dst, inv_deg)

    return jax.jit(epoch, donate_argnames=("state", "hists", "aggs"))


def make_edge_cv_device_epoch_fn(cfg: Config,
                                 tx: optax.GradientTransformation,
                                 mesh, field_offsets: dict, num_batches: int,
                                 max_nodes: int, shard_rows: int,
                                 halo_width: int,
                                 axis: str = "dp",
                                 dequant_scale=None) -> Callable:
    """Control-variate GCN x EDGE-PARTITIONED mode — the last empty
    model x mode cell (VERDICT r2 #8).

    Composition is clean because CV histories are already LOCAL state:
    each chip owns hist/agg arrays over ITS partition's local vertex space
    (exactly :func:`make_dp_cv_device_epoch_fn`), while only the layer-0
    pre-aggregated features cross chips via the cyclic halo exchange
    (exactly :func:`make_edge_device_epoch_fn`).  No collective ever
    touches history state; gradients/metrics pmean and the two-all_to_all
    feature fetch are the only ICI traffic.  (The ici mode stays
    unsupported for gcn_cv: there every chip samples the FULL graph, so
    chips would write divergent histories for the same vertex and
    reconciling them needs a per-step cross-chip scatter union — a design
    note, not an oversight; the reference never ran cvsc multi-GPU at
    all.)

    Signature (stacked [D, ...] args sharded over ``axis``)::

        epoch_fn(state, hists, aggs, epoch_key, train_nids, train_counts,
                 labels, indptr, indices, local2full, feat_shards,
                 edge_src, edge_dst, inv_deg) -> (state, hists, aggs, acc)
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..models import gcn_cv
    from ..parallel.halo import device_halo_plan, exchange_features
    from .state import cast_cv_apply

    cv_apply = cast_cv_apply(gcn_cv.apply, compute_dtype(cfg))
    feat_slice = field_offsets["features"]
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws
    D = mesh.devices.size

    def per_device_epoch(state, epoch_key, hists, aggs, train_nids,
                         train_count, labels, indptr, indices, ptr_pairs,
                         rows, local2full, feat_shard, edge_src, edge_dst,
                         inv_deg):
        metrics_acc = jnp.zeros(6, dtype=jnp.float32)
        train_nids, train_count = train_nids[0], train_count[0]
        labels, local2full = labels[0], local2full[0]
        feat_shard = feat_shard[0]
        hists = tuple(h[0] for h in hists)
        aggs = tuple(a[0] for a in aggs)
        edge_src, edge_dst, inv_deg = edge_src[0], edge_dst[0], inv_deg[0]
        # host-built ptr_pairs/rows: see make_dp_device_epoch_fn
        csr = DeviceCSR(indptr=indptr[0], indices=indices[0],
                        ptr_pairs=ptr_pairs[0],
                        indices_rows=rows[0] if paired else None)
        rank = jax.lax.axis_index(axis)
        key = jax.random.fold_in(epoch_key, rank)
        perm_key, sample_key = jax.random.split(key)
        max_train = train_nids.shape[0]
        u = jax.random.uniform(perm_key, (max_train,))
        u = jnp.where(jnp.arange(max_train) < train_count, u, jnp.inf)
        perm = jnp.argsort(u)
        idx = jnp.arange(num_batches * B, dtype=jnp.int32)
        wrapped = jnp.take(perm, idx % jnp.maximum(train_count, 1))
        seeds_all = jnp.take(train_nids, wrapped).reshape(num_batches, B)
        seed_mask_all = jnp.broadcast_to(
            train_count > 0, (num_batches * B,)
        ).reshape(num_batches, B)
        step_keys = jax.random.split(sample_key, num_batches)

        def one(carry, xs):
            state, hists, aggs, acc = carry
            seeds, smask, skey = xs
            mb = sample_minibatch_device(
                csr, seeds, smask, hops, fanout, skey, labels=labels,
                paired=paired,
            )
            rng, sub = jax.random.split(state.rng)
            sub = jax.random.fold_in(sub, rank)
            full_ids = jnp.take(local2full, mb.input_nids)
            plan = device_halo_plan(full_ids, mb.input_mask,
                                    shard_rows, D, halo_width)
            fused = dequantize_fused(
                exchange_features(feat_shard, plan, axis), dequant_scale)
            drops = (jnp.logical_and(mb.input_mask, ~plan.valid)
                     ).sum().astype(jnp.float32)
            feats = fused[:, feat_slice]
            h_hist = [jnp.take(hists[b], mb.layer_nids[b], axis=0)
                      for b in range(hops)]
            agg_hist = [jnp.take(aggs[b], mb.layer_nids[b + 1], axis=0)
                        for b in range(hops)]

            def loss_fn(params):
                logits, new_hists = cv_apply(
                    params, cfg.model, mb, feats, train=True,
                    dropout_rng=sub, h_hist=h_hist, agg_hist=agg_hist,
                )
                loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
                return loss, (logits, new_hists)

            (loss, (logits, new_hists)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            hists = list(hists)
            for b, nh in enumerate(new_hists):
                ids = jnp.where(mb.layer_mask[b], mb.layer_nids[b],
                                jnp.int32(max_nodes))
                hists[b] = hists[b].at[ids].set(nh, mode="drop")
            acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
            edges = sum(b.neigh_mask.sum() for b in mb.blocks)
            verts = sum(m.sum() for m in mb.layer_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = acc + jnp.stack([
                jax.lax.pmean(loss, axis),
                jax.lax.pmean(acc_v, axis),
                jnp.ones((), loss.dtype),
                jax.lax.psum(edges.astype(jnp.float32), axis),
                jax.lax.psum(verts.astype(jnp.float32), axis),
                jax.lax.psum(drops, axis),
            ])
            return (new_state, tuple(hists), aggs, new_acc), None

        (state, hists, aggs, metrics_acc), _ = jax.lax.scan(
            one, (state, hists, aggs, metrics_acc),
            (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )

        def refresh(hist):
            def step(accum, xs):
                s, d = xs
                return accum.at[d].add(jnp.take(hist, s, axis=0),
                                       mode="drop"), None
            init = jnp.zeros_like(hist)
            summed, _ = jax.lax.scan(step, init, (edge_src, edge_dst))
            return summed * inv_deg[:, None]

        aggs = tuple(refresh(h) for h in hists)
        return (state, tuple(h[None] for h in hists),
                tuple(a[None] for a in aggs), metrics_acc)

    def epoch(state, hists, aggs, epoch_key, train_nids, train_counts,
              labels, indptr, indices, ptr_pairs, rows, local2full,
              feat_shards, edge_src, edge_dst, inv_deg):
        fn = shard_map(
            per_device_epoch,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis)),
            out_specs=(P(), P(axis), P(axis), P()),
            check_vma=False,
        )
        return fn(state, epoch_key, hists, aggs, train_nids, train_counts,
                  labels, indptr, indices, ptr_pairs, rows, local2full,
                  feat_shards, edge_src, edge_dst, inv_deg)

    return jax.jit(epoch, donate_argnames=("state", "hists", "aggs"))


def make_cv_device_epoch_fn(cfg: Config, tx: optax.GradientTransformation,
                            field_offsets: dict, num_nodes: int,
                            dequant_scale=None,
                            nbr_meta: tuple = None) -> Callable:
    """Whole-epoch on-device control-variate GCN.

    The reference's CV model stashes history tensors in NodeFlow frames that
    never persist (gcn_cvsc.py:94); our host path already made them explicit
    state (models/gcn_cv.py).  Here they become DEVICE state: per-layer
    ``hist[b]``/``agg[b]`` arrays [N, w_b] ride the epoch as donated inputs,
    each step gathers its slices, scatters fresh activations back, and the
    epoch ends with an EXACT full-graph mean re-aggregation of every history
    — all inside the one compiled dispatch.

    The refresh is scatter-free (round 5): degree-bucketed padded window
    GATHERS (``models.inference.bucketed_aggregate``) replace the r3
    chunked edge scatters — TPU scatter-add serializes per index (~1
    us/edge; the w=16 refresh over 59.7M edges measured 7.49 s scatter vs
    0.17 s bucketed, 43x, BENCH_NOTES round 5 "CV refresh").  ``nbr_meta``
    is ``_BucketedNeighborhoods.static_meta()``; the window tables arrive
    as the ``nbr_arrays`` ARGUMENT (embedding them as constants would 413
    the axon remote compile).

    Signature::

        epoch_fn(state, hists, aggs, epoch_key, train_nids, labels, csr,
                 cache_values, nbr_arrays, inv_deg)
            -> (state, hists, aggs, metrics_acc)

    ``inv_deg`` is 1/max(in_degree,1) [N] (mean = bucketed sum x inv_deg,
    bit-matching the host path's max(deg,1) convention).
    """
    from ..models import gcn_cv
    from .state import cast_cv_apply

    cv_apply = cast_cv_apply(gcn_cv.apply, compute_dtype(cfg))
    feat_slice = field_offsets["features"]
    B = cfg.sampler.batch_size
    hops = cfg.sampler.num_hops
    fanout = cfg.sampler.hop_fanouts()
    paired = cfg.sampler.paired_draws

    @partial(jax.jit, donate_argnames=("state", "hists", "aggs"))
    def epoch_fn(state: TrainState, hists, aggs, epoch_key: jax.Array,
                 train_nids: jax.Array, labels: jax.Array, csr: DeviceCSR,
                 cache_values: jax.Array, nbr_arrays: dict,
                 inv_deg: jax.Array):
        metrics_acc = jnp.zeros(5, dtype=jnp.float32)
        if paired:
            csr = csr.with_rows()   # once per dispatch, OUTSIDE the scan
        n_train = train_nids.shape[0]
        num_batches = -(-n_train // B)
        total = num_batches * B
        perm_key, sample_key = jax.random.split(epoch_key)
        perm = jax.random.permutation(perm_key, n_train)
        idx = jnp.arange(total, dtype=jnp.int32)
        seeds_all = jnp.take(train_nids, jnp.take(perm, idx % n_train)
                             ).reshape(num_batches, B)
        seed_mask_all = (idx < n_train).reshape(num_batches, B)
        step_keys = jax.random.split(sample_key, num_batches)

        def one(carry, xs):
            state, hists, aggs, acc = carry
            seeds, smask, skey = xs
            mb = sample_minibatch_device(
                csr, seeds, smask, hops, fanout, skey, labels=labels,
                paired=paired,
            )
            rng, sub = jax.random.split(state.rng)
            fused = dequantize_fused(
                chunked_take(cache_values, mb.input_nids), dequant_scale)
            feats = fused[:, feat_slice]
            h_hist = [jnp.take(hists[b], mb.layer_nids[b], axis=0)
                      for b in range(hops)]
            agg_hist = [jnp.take(aggs[b], mb.layer_nids[b + 1], axis=0)
                        for b in range(hops)]

            def loss_fn(params):
                logits, new_hists = cv_apply(
                    params, cfg.model, mb, feats, train=True,
                    dropout_rng=sub, h_hist=h_hist, agg_hist=agg_hist,
                )
                loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
                return loss, (logits, new_hists)

            (loss, (logits, new_hists)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            # scatter fresh activations; masked rows -> index N (dropped)
            hists = list(hists)
            for b, nh in enumerate(new_hists):
                ids = jnp.where(mb.layer_mask[b], mb.layer_nids[b],
                                jnp.int32(num_nodes))
                hists[b] = hists[b].at[ids].set(nh, mode="drop")
            acc_v = masked_accuracy(logits, mb.labels, mb.seed_mask)
            edges = sum(b.neigh_mask.sum() for b in mb.blocks)
            verts = sum(m.sum() for m in mb.layer_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = acc + jnp.stack([
                loss, acc_v, jnp.ones((), loss.dtype),
                edges.astype(jnp.float32), verts.astype(jnp.float32),
            ])
            return (new_state, tuple(hists), aggs, new_acc), None

        (state, hists, aggs, metrics_acc), _ = jax.lax.scan(
            one, (state, hists, aggs, metrics_acc),
            (seeds_all, seed_mask_all, step_keys),
            unroll=cfg.train.scan_unroll,
        )

        # end-of-epoch exact refresh: agg[b] = mean over in-neighbors of
        # hist[b] (the host path's CVHistory.refresh_agg, on device) —
        # scatter-free bucketed window gathers (43x vs edge scatter-add)
        from ..models.inference import bucketed_aggregate

        def refresh(hist):
            summed = bucketed_aggregate(nbr_arrays, nbr_meta, hist, "sum")
            return summed * inv_deg[:, None]

        aggs = tuple(refresh(h) for h in hists)
        return state, hists, aggs, metrics_acc

    return epoch_fn
