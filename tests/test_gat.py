"""GAT on padded blocks: masking, degenerate-attention parity, training,
and full-neighborhood inference parity (beyond-reference model family)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.models import get_model
from pagraph_tpu.models.inference import full_graph_logits
from pagraph_tpu.sampling.sampler import NeighborSampler
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(
        num_nodes=800, num_edges=6000, feat_dim=32, num_classes=6,
        seed=5, learnable=True,
    )


def _cfg(**model_kw):
    kw = dict(n_layers=1, hidden=8, feat_dim=32, n_classes=6, num_heads=3,
              dropout=0.0)
    kw.update(model_kw)
    m = pg.ModelConfig(arch="gat", **kw)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4),
        train=pg.TrainConfig(lr=5e-3, epochs=4, warmup_epochs=1),
    )


def _one_batch(ds, cfg):
    sampler = NeighborSampler(ds.graph, ds.train_nids, cfg.sampler,
                              labels=ds.labels)
    mb = next(sampler.epoch())
    feats = jnp.asarray(ds.features[np.asarray(mb.layer_nids[0])])
    return jax.tree.map(jnp.asarray, mb), feats


def test_gat_masked_positions_do_not_leak(learn_ds):
    cfg = _cfg()
    init_fn, apply_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg.model)
    mb, feats = _one_batch(learn_ds, cfg)
    base = apply_fn(params, cfg.model, mb, feats, train=False)
    # scribble over layer-0 rows that are masked out
    mask = np.asarray(mb.layer_mask[0])
    noisy = np.asarray(feats).copy()
    noisy[~mask] = 1e6
    out = apply_fn(params, cfg.model, mb, jnp.asarray(noisy), train=False)
    sm = np.asarray(mb.seed_mask)
    np.testing.assert_allclose(np.asarray(base)[sm], np.asarray(out)[sm],
                               rtol=1e-5)


def test_gat_zero_attention_is_uniform_mean(learn_ds):
    """With a_self = a_neigh = 0 every edge logit ties, so attention is a
    uniform average over {self} + valid sampled neighbors — checkable by
    hand against the block contents."""
    cfg = _cfg(n_layers=0)          # single attention layer -> logits
    cfg.sampler.num_hops = 1
    init_fn, apply_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg.model)
    params["layers"][0]["a_self"] = jnp.zeros_like(
        params["layers"][0]["a_self"])
    params["layers"][0]["a_neigh"] = jnp.zeros_like(
        params["layers"][0]["a_neigh"])
    mb, feats = _one_batch(learn_ds, cfg)
    out = np.asarray(apply_fn(params, cfg.model, mb, feats, train=False))

    K = cfg.model.num_heads
    w = np.asarray(params["layers"][0]["w"])
    z = (np.asarray(feats) @ w).reshape(feats.shape[0], K, -1)
    blk = mb.blocks[0]
    nmask = np.asarray(blk.neigh_mask)
    npos = np.asarray(blk.neigh_pos)
    sm = np.asarray(mb.seed_mask)
    for i in np.nonzero(sm)[0][:20]:
        members = [z[i]] + [z[npos[i, f]] for f in range(nmask.shape[1])
                            if nmask[i, f]]
        want = np.mean(np.stack(members), axis=0).mean(axis=0)  # head-avg
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-6)


def test_gat_training_reduces_loss(learn_ds):
    cfg = _cfg()
    cfg.model.dropout = 0.1
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


def test_gat_full_graph_inference_matches_blocks(tiny_ds):
    """With fanout >= max in-degree the sampler takes ALL neighbors, so the
    block softmax covers the full neighborhood — logits must match the
    host full-graph path exactly."""
    ds = tiny_ds
    max_deg = int(np.diff(ds.graph.indptr).max())
    m = pg.ModelConfig(arch="gat", n_layers=0, hidden=8, feat_dim=16,
                       n_classes=5, num_heads=2, dropout=0.0)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=max_deg, num_hops=1,
                                 seed=1),
        train=pg.TrainConfig(lr=1e-2),
    )
    init_fn, apply_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(2), cfg.model)
    mb, feats = _one_batch(ds, cfg)
    block_logits = np.asarray(
        apply_fn(params, cfg.model, mb, feats, train=False))
    full = full_graph_logits(jax.tree.map(np.asarray, params), cfg.model,
                             ds.graph, ds.features)
    seeds = np.asarray(mb.layer_nids[-1])
    sm = np.asarray(mb.seed_mask)
    np.testing.assert_allclose(block_logits[sm], full[seeds[sm]],
                               rtol=1e-4, atol=1e-5)


def test_gat_config_validation():
    with pytest.raises(ValueError, match="preprocess"):
        pg.Config(
            model=pg.ModelConfig(arch="gat", n_layers=1, hidden=8,
                                 feat_dim=16, n_classes=5, preprocess=True),
            sampler=pg.SamplerConfig(batch_size=32, fanout=2, num_hops=1),
        )


def test_gat_on_device_epoch(learn_ds):
    """gat composes with the whole-epoch-in-one-dispatch path (the block
    ops are prefix-layout aware, so no model-specific wiring is needed)."""
    cfg = _cfg()
    cfg.model.dropout = 0.1
    cfg.train.on_device_sampling = True
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.parametrize("n_layers", [0, 1])
def test_gat_device_backend_matches_host(tiny_ds, n_layers):
    """backend='device' (three chunked edge scans: scatter-max, exp-sum,
    weighted message add) must agree with the exact host softmax path."""
    m = pg.ModelConfig(arch="gat", n_layers=n_layers, hidden=8, feat_dim=16,
                       n_classes=5, num_heads=2, dropout=0.0)
    init_fn, _ = get_model(m)
    params = jax.tree.map(np.asarray, init_fn(jax.random.PRNGKey(2), m))
    host = full_graph_logits(params, m, tiny_ds.graph, tiny_ds.features,
                             backend="host")
    dev = full_graph_logits(params, m, tiny_ds.graph, tiny_ds.features,
                            backend="device", edge_chunk=64)
    np.testing.assert_allclose(host, dev, rtol=2e-5, atol=1e-6)
