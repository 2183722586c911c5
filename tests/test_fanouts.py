"""Per-hop fanout lists (the DGL-style [15,10,5] recipe, beyond-reference).

``SamplerConfig.fanouts`` is LAYER-ordered like DGL: fanouts[0] is the
outermost (input-side) hop, fanouts[-1] expands from the seeds.  Every
backend — numpy, native C++, on-device — must honour it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.config import SamplerConfig
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.sampling.sampler import sample_minibatch


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(
        num_nodes=800, num_edges=6000, feat_dim=32, num_classes=6,
        seed=5, learnable=True,
    )


def test_config_orderings_and_validation():
    cfg = SamplerConfig(batch_size=8, fanouts=(4, 2), num_hops=2)
    assert cfg.hop_fanouts() == (2, 4)       # seeds outward
    assert cfg.block_fanouts() == (4, 2)     # outermost block first
    caps = cfg.layer_capacities(10**9, pad_to=1)
    # seeds=8; hop0 (from seeds, fanout 2): 8*3=24; hop1 (fanout 4): 24*5=120
    assert caps == (120, 24, 8)
    with pytest.raises(ValueError):
        SamplerConfig(fanouts=(4, 2, 1), num_hops=2).hop_fanouts()
    with pytest.raises(ValueError):
        SamplerConfig(fanouts=(4, 0), num_hops=2).hop_fanouts()
    with pytest.raises(ValueError):
        pg.Config(
            model=pg.ModelConfig(n_layers=1, feat_dim=8, n_classes=3),
            sampler=pg.SamplerConfig(fanouts=(4,), num_hops=2),
        )


def _check_blocks(mb, g, block_fanouts):
    edges = set()
    for v in range(g.num_nodes):
        for u in g.in_neighbors(v):
            edges.add((int(u), int(v)))
    assert tuple(b.fanout for b in mb.blocks) == tuple(block_fanouts)
    for i, block in enumerate(mb.blocks):
        src_ids = np.asarray(mb.layer_nids[i])
        dst_ids = np.asarray(mb.layer_nids[i + 1])
        n_dst = int(np.asarray(mb.layer_mask[i + 1]).sum())
        npos = np.asarray(block.neigh_pos)
        nmask = np.asarray(block.neigh_mask)
        assert not nmask[n_dst:].any()
        for d in range(n_dst):
            for k in range(block.fanout):
                if nmask[d, k]:
                    assert (int(src_ids[npos[d, k]]), int(dst_ids[d])) in edges
        degs = np.diff(g.indptr)[dst_ids[:n_dst]]
        assert np.all(nmask[:n_dst].any(axis=1) == (degs > 0))


def test_numpy_sampler_per_hop(tiny_ds):
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=16, fanouts=(5, 2), num_hops=2, seed=3)
    caps = cfg.layer_capacities(g.num_nodes)
    rng = np.random.default_rng(0)
    mb = sample_minibatch(g, np.arange(16), cfg, caps, rng,
                          labels=tiny_ds.labels)
    _check_blocks(mb, g, (5, 2))


def test_native_sampler_per_hop(tiny_ds):
    native = pytest.importorskip("pagraph_tpu.sampling.native")
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=16, fanouts=(5, 2), num_hops=2)
    caps = cfg.layer_capacities(g.num_nodes)
    ns = native.NativeSampler(g, cfg, caps)
    mb = ns.sample(np.arange(16, dtype=np.int64), tiny_ds.labels, seed=7)
    _check_blocks(mb, g, (5, 2))


def test_native_matches_numpy_take_all(tiny_ds):
    """Distinct per-hop fanouts both >= max degree force take-all on every
    backend: identical edge multisets per destination."""
    native = pytest.importorskip("pagraph_tpu.sampling.native")
    g = tiny_ds.graph
    md = int(np.diff(g.indptr).max())
    cfg = SamplerConfig(batch_size=12, fanouts=(md + 3, md), num_hops=2)
    caps = cfg.layer_capacities(g.num_nodes)
    seeds = np.arange(12, dtype=np.int64)
    mb_np = sample_minibatch(g, seeds, cfg, caps,
                             np.random.default_rng(0), tiny_ds.labels)
    mb_nat = native.NativeSampler(g, cfg, caps).sample(
        seeds, tiny_ds.labels, seed=1)
    for a, b in zip(mb_np.blocks, mb_nat.blocks):
        assert a.fanout == b.fanout
    for mb in (mb_np, mb_nat):
        _check_blocks(mb, g, (md + 3, md))

    def edge_multiset(mb):
        out = set()
        for i, blk in enumerate(mb.blocks):
            src = np.asarray(mb.layer_nids[i])
            dst = np.asarray(mb.layer_nids[i + 1])
            for d in range(int(np.asarray(mb.layer_mask[i + 1]).sum())):
                for k in range(blk.fanout):
                    if np.asarray(blk.neigh_mask)[d, k]:
                        out.add((i, int(src[np.asarray(blk.neigh_pos)[d, k]]),
                                 int(dst[d])))
        return out

    assert edge_multiset(mb_np) == edge_multiset(mb_nat)


def test_device_sampler_per_hop(tiny_ds):
    from pagraph_tpu.sampling.device_sampler import (
        DeviceCSR, sample_minibatch_device)

    g = tiny_ds.graph
    csr = DeviceCSR.from_graph(g).with_pairs()
    B = 16
    seeds = jnp.arange(B, dtype=jnp.int32)
    mask = jnp.ones(B, dtype=bool)
    mb = sample_minibatch_device(csr, seeds, mask, 2, (2, 5),
                                 jax.random.PRNGKey(0),
                                 labels=jnp.asarray(tiny_ds.labels,
                                                    dtype=jnp.int32))
    # hop order is seeds-outward: widths B -> B*3 -> B*3*6
    assert mb.layer_nids[-1].shape == (B,)
    assert mb.layer_nids[1].shape == (B * 3,)
    assert mb.layer_nids[0].shape == (B * 3 * 6,)
    _check_blocks(mb, g, (5, 2))


@pytest.mark.parametrize("on_device", [False, True])
def test_trainer_per_hop_fanouts(learn_ds, on_device):
    cfg = pg.Config(
        model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16,
                             feat_dim=learn_ds.feat_dim,
                             n_classes=learn_ds.num_classes, dropout=0.0),
        sampler=pg.SamplerConfig(batch_size=64, fanouts=(4, 2), num_hops=2,
                                 seed=0),
        train=pg.TrainConfig(epochs=3, lr=0.05,
                             on_device_sampling=on_device),
    )
    from pagraph_tpu.train.loop import Trainer
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(cfg.train.epochs)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_pack_roundtrip_per_hop(tiny_ds):
    from pagraph_tpu.sampling.pack import make_layout, pack, unpack_numpy
    from pagraph_tpu.storage.cache import FeatureCache
    from pagraph_tpu.storage.feature_store import FeatureStore

    cfg = SamplerConfig(batch_size=16, fanouts=(5, 2), num_hops=2, seed=5)
    caps = cfg.layer_capacities(tiny_ds.graph.num_nodes)
    rng = np.random.default_rng(1)
    mb = sample_minibatch(tiny_ds.graph, np.arange(16), cfg, caps, rng,
                          labels=tiny_ds.labels)
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    cache = FeatureCache(store, ["features"], tiny_ds.graph)
    cache.fill(capacity=30)
    plan = cache.fetch_plan(np.asarray(mb.input_nids),
                            np.asarray(mb.input_mask))
    layout = make_layout(caps, cfg.block_fanouts(), cache.total_dim,
                         plan.miss_feats.shape[0])
    i32, u8, f32 = pack(mb, plan, layout)
    mb2 = unpack_numpy(layout, i32, u8)
    for a, b in zip(mb.layer_nids, mb2.layer_nids):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for ba, bb in zip(mb.blocks, mb2.blocks):
        assert ba.fanout == bb.fanout
        np.testing.assert_array_equal(np.asarray(ba.neigh_pos),
                                      np.asarray(bb.neigh_pos))
        np.testing.assert_array_equal(np.asarray(ba.neigh_mask),
                                      np.asarray(bb.neigh_mask))


def test_cli_parses_fanout_list(tmp_path):
    import argparse

    from pagraph_tpu.cli import common

    p = argparse.ArgumentParser()
    common.add_model_flags(p)
    common.add_sampler_flags(p)
    common.add_cache_flags(p)
    common.add_train_flags(p)
    common.add_partition_flags(p)
    args = p.parse_args(["--num-neighbors", "5,2", "--n-layers", "1"])
    cfg = common.build_config(args, feat_dim=8, n_classes=3)
    assert cfg.sampler.fanouts == (5, 2)
    assert cfg.sampler.hop_fanouts() == (2, 5)
    args = p.parse_args(["--num-neighbors", "3"])
    cfg = common.build_config(args, feat_dim=8, n_classes=3)
    assert cfg.sampler.fanouts is None
    assert cfg.sampler.fanout == 3
