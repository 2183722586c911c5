"""Multi-chip data-parallel train step: shard_map + psum over ICI.

TPU-native replacement for the reference's DDP/NCCL gradient allreduce
(reference: examples/profile/pa_gcn.py:21,65; SURVEY.md §2.3 N5).  Each mesh
coordinate owns one graph partition: its minibatch, fetch plan and HBM cache
shard arrive stacked on a leading device axis sharded over ``dp``; parameters
and optimizer state are replicated; gradients are ``pmean``-ed inside the
compiled step, so the collective is scheduled by XLA on ICI and overlaps with
the backward pass exactly as DDP's bucketed allreduce does — without any of
the process-group machinery.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import Config
from ..models import get_model
from ..storage.cache import FetchPlan, assemble_features, dequantize_fused
from ..train.objective import masked_accuracy, masked_cross_entropy
from ..train.state import TrainState, cast_apply, compute_dtype


def make_dp_train_step(
    cfg: Config,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    field_offsets: dict,
    axis: str = "dp",
    dequant_scale=None,
) -> Callable:
    """Build step(state, mb_stacked, plan_stacked, cache_stacked) -> (state, metrics).

    ``mb_stacked``/``plan_stacked``/``cache_stacked`` carry a leading device
    axis of size mesh.shape[axis], sharded over ``axis``; ``state`` is
    replicated.
    """
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")

    def per_device_step(layout, state: TrainState, metrics_acc: jax.Array,
                        i32: jax.Array, u8: jax.Array, f32: jax.Array,
                        cache_values: jax.Array, cache_map: jax.Array):
        from ..sampling.pack import unpack
        from ..storage.cache import assemble_features_from_map

        # leading device axis is size 1 inside the shard: drop it
        mb, plan = unpack(layout, i32[0], u8[0], f32[0])
        cache_values = cache_values[0]
        my_rank = jax.lax.axis_index(axis)
        rng, sub = jax.random.split(state.rng)
        sub = jax.random.fold_in(sub, my_rank)   # independent dropout per chip

        if layout.device_plan:
            fused = assemble_features_from_map(
                cache_values, cache_map[0], mb.input_nids, mb.input_mask,
                f32[0],
            )
        else:
            fused = assemble_features(cache_values, plan)
        fused = dequantize_fused(fused, dequant_scale)
        feats = fused[:, feat_slice]

        def loss_fn(params):
            kwargs = dict(train=True, dropout_rng=sub)
            if sage_pre:
                kwargs["neigh_feats"] = fused[:, neigh_slice]
            logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
            loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # DDP-equivalent gradient sync: mean over the dp axis (ICI collective)
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
        # edges: the neigh masks travel in the packed batch, so this is
        # exact; layer masks for INNER layers do not (unpack fabricates
        # ones), so vertex counts stay host-side (run_epoch).  f32
        # accumulation bounds the per-epoch count error at 2^-24 relative
        # (~tens of edges per billion) — negligible for throughput.
        edges = sum(b.neigh_mask.sum() for b in mb.blocks)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        delta = jnp.stack([
            jax.lax.pmean(loss, axis),
            jax.lax.pmean(acc, axis),
            jnp.ones((), loss.dtype),
            # GLOBAL edge count: multi-process, the host-side counters
            # only see this process's partitions
            jax.lax.psum(edges.astype(jnp.float32), axis),
        ])
        return new_state, metrics_acc + delta

    def stepper(layout, state, metrics_acc, i32, u8, f32, cache_values,
                cache_map):
        fn = shard_map(
            partial(per_device_step, layout),
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, metrics_acc, i32, u8, f32, cache_values, cache_map)

    return jax.jit(stepper, static_argnames=("layout",),
                   donate_argnames=("metrics_acc",))


def make_dp_halo_train_step(
    cfg: Config,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    feat_slice: slice,
    neigh_slice: Optional[slice] = None,
    axis: str = "dp",
    dequant_scale=None,
) -> Callable:
    """DP step with ICI-distributed features: instead of the HBM cache +
    host-miss FetchPlan, batch features arrive via a chip-to-chip
    ``all_to_all`` exchange from the sharded feature matrix
    (see parallel/halo.py).  Signature:

        step(layout, state, metrics_acc, i32, u8, halo_plan, feat_shards)
    """
    from ..parallel.halo import HaloPlan, exchange_features
    from ..sampling.pack import unpack

    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess

    def per_device_step(layout, state: TrainState, metrics_acc, i32, u8,
                        plan: HaloPlan, feat_shard):
        zero_f32 = jnp.zeros((0, 0), dtype=jnp.float32)
        mb, _ = unpack(layout, i32[0], u8[0], zero_f32)
        plan = jax.tree.map(lambda x: x[0], plan)
        my_rank = jax.lax.axis_index(axis)
        rng, sub = jax.random.split(state.rng)
        sub = jax.random.fold_in(sub, my_rank)

        fused = dequantize_fused(exchange_features(feat_shard[0], plan, axis),
                                 dequant_scale)
        feats = fused[:, feat_slice]

        def loss_fn(params):
            kwargs = dict(train=True, dropout_rng=sub)
            if sage_pre:
                kwargs["neigh_feats"] = fused[:, neigh_slice]
            logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
            loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
        # edges: the neigh masks travel in the packed batch, so this is
        # exact; layer masks for INNER layers do not (unpack fabricates
        # ones), so vertex counts stay host-side (run_epoch).  f32
        # accumulation bounds the per-epoch count error at 2^-24 relative
        # (~tens of edges per billion) — negligible for throughput.
        edges = sum(b.neigh_mask.sum() for b in mb.blocks)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        delta = jnp.stack([
            jax.lax.pmean(loss, axis),
            jax.lax.pmean(acc, axis),
            jnp.ones((), loss.dtype),
            jax.lax.psum(edges.astype(jnp.float32), axis),
        ])
        return new_state, metrics_acc + delta

    def stepper(layout, state, metrics_acc, i32, u8, plan, feat_shards):
        fn = shard_map(
            partial(per_device_step, layout),
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, metrics_acc, i32, u8, plan, feat_shards)

    return jax.jit(stepper, static_argnames=("layout",),
                   donate_argnames=("metrics_acc",))
