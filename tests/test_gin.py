"""GIN on padded blocks: hand-checked update, masking, training,
full-neighborhood inference parity (beyond-reference model family)."""
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
    kw = dict(n_layers=1, hidden=8, feat_dim=32, n_classes=6, dropout=0.0)
    kw.update(model_kw)
    m = pg.ModelConfig(arch="gin", **kw)
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


def test_gin_single_update_matches_numpy(learn_ds):
    """One GIN update checked against a hand-built numpy reference from
    the raw block contents: MLP((1+eps)*h_i + sum_{valid j} h_j)."""
    cfg = _cfg(n_layers=0)           # single update -> logits
    cfg.sampler.num_hops = 1
    init_fn, apply_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg.model)
    params["updates"][0]["eps"] = jnp.asarray(0.25, jnp.float32)
    mb, feats = _one_batch(learn_ds, cfg)
    out = np.asarray(apply_fn(params, cfg.model, mb, feats, train=False))

    p = jax.tree.map(np.asarray, params["updates"][0])
    h = np.asarray(feats)
    blk = mb.blocks[0]
    nmask = np.asarray(blk.neigh_mask)
    npos = np.asarray(blk.neigh_pos)
    spos = np.asarray(blk.self_pos)
    sm = np.asarray(mb.seed_mask)
    for i in np.nonzero(sm)[0][:20]:
        s = sum((h[npos[i, f]] for f in range(nmask.shape[1]) if nmask[i, f]),
                np.zeros_like(h[0]))
        pre = (1.0 + p["eps"]) * h[spos[i]] + s
        hid = np.maximum(pre @ p["w1"]["w"] + p["w1"]["b"], 0.0)
        want = hid @ p["w2"]["w"] + p["w2"]["b"]
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-6)


def test_gin_masked_positions_do_not_leak(learn_ds):
    cfg = _cfg()
    init_fn, apply_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg.model)
    mb, feats = _one_batch(learn_ds, cfg)
    base = apply_fn(params, cfg.model, mb, feats, train=False)
    mask = np.asarray(mb.layer_mask[0])
    noisy = np.asarray(feats).copy()
    noisy[~mask] = 1e6
    out = apply_fn(params, cfg.model, mb, jnp.asarray(noisy), train=False)
    sm = np.asarray(mb.seed_mask)
    np.testing.assert_allclose(np.asarray(base)[sm], np.asarray(out)[sm],
                               rtol=1e-5)


def test_gin_training_reduces_loss(learn_ds):
    cfg = _cfg()
    cfg.model.dropout = 0.1
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.parametrize("backend", ["host", "device"])
def test_gin_full_graph_inference_matches_blocks(tiny_ds, backend):
    """With fanout >= max in-degree the sampled sum covers every
    in-neighbor, so block logits must match both full-graph backends."""
    ds = tiny_ds
    max_deg = int(np.diff(ds.graph.indptr).max())
    m = pg.ModelConfig(arch="gin", n_layers=1, hidden=8, feat_dim=16,
                       n_classes=5, dropout=0.0)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=max_deg, num_hops=2,
                                 seed=1),
        train=pg.TrainConfig(lr=1e-2),
    )
    init_fn, apply_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(2), cfg.model)
    mb, feats = _one_batch(ds, cfg)
    block_logits = np.asarray(
        apply_fn(params, cfg.model, mb, feats, train=False))
    full = full_graph_logits(jax.tree.map(np.asarray, params), cfg.model,
                             ds.graph, ds.features, backend=backend,
                             edge_chunk=64)
    seeds = np.asarray(mb.layer_nids[-1])
    sm = np.asarray(mb.seed_mask)
    np.testing.assert_allclose(block_logits[sm], full[seeds[sm]],
                               rtol=1e-4, atol=1e-5)


def test_gin_config_rejects_preprocess():
    with pytest.raises(ValueError, match="gin"):
        pg.Config(
            model=pg.ModelConfig(arch="gin", n_layers=1, hidden=8,
                                 feat_dim=16, n_classes=5, preprocess=True),
            sampler=pg.SamplerConfig(batch_size=32, fanout=2, num_hops=1),
        )


def test_gin_on_device_epoch(learn_ds):
    """gin composes with the whole-epoch-in-one-dispatch path."""
    cfg = _cfg()
    cfg.model.dropout = 0.1
    cfg.train.on_device_sampling = True
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
