"""Train state and single-device train step.

The reference couples model, DDP wrapper, optimizer and loop in each trainer
script (examples/profile/pa_gcn.py:53-97); here the state is one pytree and
the step is one jitted function.  The multi-device variant (shard_map + psum)
lives in ``pagraph_tpu.parallel.train_step``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import get_model
from ..sampling.block import MiniBatch
from ..storage.cache import FetchPlan, assemble_features, dequantize_fused
from .objective import masked_accuracy, masked_cross_entropy


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array          # int32 scalar
    rng: jax.Array           # dropout PRNG key


def compute_dtype(cfg: Config):
    """Activation/matmul dtype from ``TrainConfig.dtype``."""
    return jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32


def cast_apply(apply_fn: Callable, dtype) -> Callable:
    """Mixed-precision wrapper: run forward (and therefore backward) with
    params + activations cast to ``dtype`` — on TPU, bfloat16 doubles MXU
    matmul throughput — while master params, optimizer state and the loss
    stay float32 (the casts are differentiable, so grads come back f32).
    Identity for float32."""
    if dtype == jnp.float32:
        return apply_fn

    def wrapped(params, mcfg, mb, feats, **kw):
        params = jax.tree.map(lambda p: p.astype(dtype), params)
        feats = feats.astype(dtype)
        if kw.get("neigh_feats") is not None:
            kw["neigh_feats"] = kw["neigh_feats"].astype(dtype)
        return apply_fn(params, mcfg, mb, feats, **kw).astype(jnp.float32)

    return wrapped


def cast_cv_apply(apply_fn: Callable, dtype) -> Callable:
    """``cast_apply`` for the control-variate model's
    ``(logits, new_hists)`` signature: history slices also run in ``dtype``;
    fresh histories come back f32 (they scatter into f32 state arrays)."""
    if dtype == jnp.float32:
        return apply_fn

    def wrapped(params, mcfg, mb, feats, *, train, dropout_rng,
                h_hist, agg_hist):
        cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
        logits, new_hists = apply_fn(
            cast(params), mcfg, mb, feats.astype(dtype), train=train,
            dropout_rng=dropout_rng, h_hist=cast(h_hist),
            agg_hist=cast(agg_hist),
        )
        return (logits.astype(jnp.float32),
                jax.tree.map(lambda x: x.astype(jnp.float32), new_hists))

    return wrapped


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam, optionally under a cosine-decay schedule (beyond-reference:
    the reference trains at a fixed lr, pa_gcn.py:63; products-scale runs
    here showed val-acc decaying past the fixed-lr sweet spot,
    BENCH_NOTES 'accuracy trajectory')."""
    t = cfg.train
    if t.lr_schedule == "none":
        return optax.adam(t.lr)
    if t.lr_schedule == "cosine":
        steps = max(int(t.lr_decay_steps), 1)
        sched = optax.cosine_decay_schedule(t.lr, steps, alpha=0.05)
        return optax.adam(sched)
    raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")


def create_state(cfg: Config, seed: int = 0) -> tuple[TrainState, optax.GradientTransformation]:
    init_fn, _ = get_model(cfg.model)
    key = jax.random.PRNGKey(seed)
    pkey, dkey = jax.random.split(key)
    params = init_fn(pkey, cfg.model)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32), rng=dkey), tx


def make_train_step(cfg: Config, tx: optax.GradientTransformation) -> Callable:
    """Build the jitted (state, minibatch, feats[, neigh_feats]) -> (state, metrics) step."""
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess

    @jax.jit
    def train_step(state: TrainState, mb: MiniBatch, feats: jax.Array,
                   neigh_feats: Optional[jax.Array] = None):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            kwargs = dict(train=True, dropout_rng=sub)
            if sage_pre:
                kwargs["neigh_feats"] = neigh_feats
            logits = apply_fn(params, cfg.model, mb, feats, **kwargs)
            loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def make_packed_train_step(cfg: Config, tx: optax.GradientTransformation,
                           field_offsets: dict,
                           dequant_scale=None) -> Callable:
    """Packed-transfer step: consumes the 3 flat buffers from
    ``sampling.pack`` plus a device-side metrics accumulator, so the host
    never syncs inside an epoch (metrics are fetched once at epoch end).

    Signature: step(layout, state, metrics_acc, i32, u8, f32, cache_values)
      -> (state, metrics_acc + [loss, acc, 1])
    ``layout`` is static (one executable per miss-bucket size).
    """
    from ..sampling.pack import unpack
    from ..storage.cache import assemble_features_from_map

    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")

    @partial(jax.jit, static_argnames=("layout",), donate_argnames=("metrics_acc",))
    def train_step(layout, state: TrainState, metrics_acc: jax.Array,
                   i32: jax.Array, u8: jax.Array, f32: jax.Array,
                   cache_values: jax.Array, cache_map: jax.Array):
        mb, plan = unpack(layout, i32, u8, f32)
        rng, sub = jax.random.split(state.rng)
        if layout.device_plan:
            fused = assemble_features_from_map(
                cache_values, cache_map, mb.input_nids, mb.input_mask, f32
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
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, metrics_acc + jnp.stack(
            [loss, acc, jnp.ones((), loss.dtype)]
        )

    return train_step


def make_multistep_train_step(cfg: Config, tx: optax.GradientTransformation,
                              field_offsets: dict,
                              dequant_scale=None) -> Callable:
    """K training steps per dispatch: consumes [K, ...] stacked packed
    buffers and runs a ``lax.scan`` over them inside one compiled call.
    Amortizes per-dispatch host/tunnel latency K-fold; identical math to
    K sequential ``make_packed_train_step`` calls.
    """
    from ..sampling.pack import unpack
    from ..storage.cache import assemble_features_from_map

    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")

    @partial(jax.jit, static_argnames=("layout",),
             donate_argnames=("metrics_acc",))
    def train_steps(layout, state: TrainState, metrics_acc: jax.Array,
                    i32: jax.Array, u8: jax.Array, f32: jax.Array,
                    cache_values: jax.Array, cache_map: jax.Array):
        def one(carry, xs):
            state, metrics_acc = carry
            i32_k, u8_k, f32_k = xs
            mb, _ = unpack(layout, i32_k, u8_k, f32_k)
            rng, sub = jax.random.split(state.rng)
            fused = dequantize_fused(assemble_features_from_map(
                cache_values, cache_map, mb.input_nids, mb.input_mask, f32_k
            ), dequant_scale)
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
            acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1, rng=rng)
            new_acc = metrics_acc + jnp.stack(
                [loss, acc, jnp.ones((), loss.dtype)])
            return (new_state, new_acc), None

        (state, metrics_acc), _ = jax.lax.scan(
            one, (state, metrics_acc), (i32, u8, f32)
        )
        return state, metrics_acc

    return train_steps


def make_cv_train_step(cfg: Config, tx: optax.GradientTransformation,
                       field_offsets: dict,
                       dequant_scale=None) -> Callable:
    """Control-variate GCN step: consumes per-layer history slices, returns
    fresh histories for scatter-back (see models/gcn_cv.py)."""
    from ..models import gcn_cv

    cv_apply = cast_cv_apply(gcn_cv.apply, compute_dtype(cfg))
    feat_slice = field_offsets["features"]

    @jax.jit
    def train_step(state: TrainState, mb: MiniBatch, plan: FetchPlan,
                   cache_values: jax.Array, h_hist, agg_hist):
        rng, sub = jax.random.split(state.rng)
        fused = dequantize_fused(assemble_features(cache_values, plan),
                                 dequant_scale)
        feats = fused[:, feat_slice]

        def loss_fn(params):
            logits, new_hists = cv_apply(
                params, cfg.model, mb, feats, train=True, dropout_rng=sub,
                h_hist=h_hist, agg_hist=agg_hist,
            )
            loss = masked_cross_entropy(logits, mb.labels, mb.seed_mask)
            return loss, (logits, new_hists)

        (loss, (logits, new_hists)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, {"loss": loss, "acc": acc}, new_hists

    return train_step


def make_cached_train_step(cfg: Config, tx: optax.GradientTransformation,
                           field_offsets: dict,
                           dequant_scale=None) -> Callable:
    """Train step consuming a cache :class:`FetchPlan` instead of raw
    features: assembles the fused [cap0, total_dim] feature block inside jit
    from the HBM cache + the transferred miss rows, then slices model fields.

    This is the TPU analog of the reference hot loop's
    'gpu-load' -> 'gpu-compute' sequence (pa_gcn.py:87-97) with the load
    stage fused into the compiled step.
    """
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    sage_pre = cfg.model.arch == "graphsage" and cfg.model.preprocess
    feat_slice = field_offsets["features"]
    neigh_slice = field_offsets.get("neigh")

    @jax.jit
    def train_step(state: TrainState, mb: MiniBatch, plan: FetchPlan,
                   cache_values: jax.Array):
        rng, sub = jax.random.split(state.rng)
        fused = dequantize_fused(assemble_features(cache_values, plan),
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
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = masked_accuracy(logits, mb.labels, mb.seed_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, {"loss": loss, "acc": acc}

    return train_step
