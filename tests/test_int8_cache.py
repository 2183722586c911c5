"""int8 feature tier: per-column symmetric quantization of the feature
store (cache rows, miss rows, ICI halo shards), dequantized inside jit.

Quarter the bytes of f32 everywhere feature rows sit or move:
HBM cache residency, miss-path H2D, and the halo all_to_all.  The scale
is store-wide so every path (cache hit, miss, halo fetch) dequantizes
identically.
"""
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.storage.cache import (FeatureCache, assemble_features,
                                       compute_dequant_scale,
                                       dequantize_fused, quantize_rows)
from pagraph_tpu.storage.feature_store import FeatureStore
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(num_nodes=800, num_edges=6000, feat_dim=32,
                             num_classes=6, seed=5, learnable=True)


def _cfg(dtype, on_device=False):
    m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4),
        cache=pg.CacheConfig(dtype=dtype,
                             capacity=None if on_device else 200),
        train=pg.TrainConfig(lr=1e-2, on_device_sampling=on_device),
    )


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(500, 17)).astype(np.float32) * \
        rng.uniform(0.01, 30.0, size=17).astype(np.float32)
    rows[:, 3] = 0.0                      # zero-variance column
    store = FeatureStore({"features": rows})
    scale = compute_dequant_scale(store, ["features"], chunk=128)
    assert scale.shape == (17,)
    assert scale[3] == 1.0                # degenerate column -> scale 1
    q = quantize_rows(rows, scale)
    assert q.dtype == np.int8
    assert np.abs(q).max() <= 127
    back = q.astype(np.float32) * scale[None, :]
    # round-to-nearest: error <= scale/2 per element
    assert np.all(np.abs(back - rows) <= scale[None, :] * 0.5 + 1e-7)
    assert np.all(back[:, 3] == 0.0)


def test_int8_cache_hit_and_miss_assembly():
    """Partial capacity: hits come from the int8 cache, misses from int8
    fetch-plan rows; both dequantize to within scale/2 of the store."""
    from pagraph_tpu.graph import CSRGraph

    rng = np.random.default_rng(1)
    n, d = 300, 12
    feats = (rng.normal(size=(n, d)) * 5).astype(np.float32)
    g = CSRGraph(indptr=np.zeros(n + 1, dtype=np.int64),
                 indices=np.zeros(0, dtype=np.int32),
                 out_degrees=np.zeros(n, dtype=np.int32))
    store = FeatureStore({"features": feats})
    cache = FeatureCache(store, ["features"], g, dtype="int8")
    assert cache.np_dtype == np.int8
    cache.fill(capacity=100)              # partial: both paths exercised
    assert str(cache.cache_values.dtype) == "int8"

    nids = rng.integers(0, n, size=64).astype(np.int32)
    mask = np.ones(64, dtype=bool)
    plan = cache.fetch_plan(nids, mask, to_device=True)
    assert str(plan.miss_feats.dtype) == "int8"
    fused = np.asarray(dequantize_fused(
        assemble_features(cache.cache_values, plan), cache.dequant_scale))
    err = np.abs(fused - feats[nids])
    assert np.all(err <= cache.dequant_scale[None, :] * 0.5 + 1e-7)


def test_int8_cache_trains_close_to_f32(learn_ds):
    results = {}
    for dtype in ("float32", "int8"):
        tr = Trainer.from_dataset(_cfg(dtype), learn_ds, seed=0)
        tr.train(3)
        results[dtype] = [m.mean_loss for m in tr.epoch_metrics]
        if dtype == "int8":
            assert str(tr.cache.cache_values.dtype) == "int8"
    f32, i8 = results["float32"], results["int8"]
    assert i8[-1] < i8[0]                 # still converges
    assert abs(i8[-1] - f32[-1]) < 0.25 * max(f32[-1], 0.2), (f32, i8)


def test_int8_on_device_epoch_trains(learn_ds):
    tr = Trainer.from_dataset(_cfg("int8", on_device=True), learn_ds, seed=0)
    tr.train(4)
    assert str(tr.cache.cache_values.dtype) == "int8"
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_int8_ici_mode(learn_ds):
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    cfg = _cfg("int8")
    cfg.partition.num_parts = 4
    cfg.partition.method = "hash"
    mesh = make_mesh(4)
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0,
                                          feature_source="ici")
    tr.train(2)
    assert str(tr._feat_shards.dtype) == "int8"   # 1-byte halo rows
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] + 0.2
    tr.close()


def test_int8_edge_device_mode(learn_ds):
    """int8 features through the edge-partitioned on-device epoch: the
    halo all_to_all moves 1-byte rows, dequant after the exchange."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    cfg = _cfg("int8", on_device=True)
    cfg.sampler.batch_size = 64
    cfg.partition.num_parts = 4
    cfg.partition.method = "hash"
    mesh = make_mesh(4)
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0,
                                          feature_source="edge")
    tr.train(3)
    assert str(tr._feat_shards.dtype) == "int8"
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] + 0.2
    tr.close()


def test_int8_dp_cache_device_mode(learn_ds):
    """dp+cache on-device mode with int8 per-partition caches."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    cfg = _cfg("int8", on_device=True)
    cfg.sampler.batch_size = 64
    cfg.partition.num_parts = 4
    cfg.partition.method = "hash"
    mesh = make_mesh(4)
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(3)
    assert str(tr._cache_stacked.dtype) == "int8"
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] + 0.2
    tr.close()


def test_prequantized_store_tier():
    """Pre-quantized host tier (round 5): int8-stored fields with scales.
    Cache fill and miss rows are BIT-identical to the quantize-at-fill path
    (same store-wide scale formula), and the f32 gather path dequantizes."""
    from pagraph_tpu.graph import CSRGraph
    from pagraph_tpu.storage.feature_store import quantize_store

    rng = np.random.default_rng(7)
    n, d = 256, 9
    feats = (rng.normal(size=(n, d)) * 3).astype(np.float32)
    g = CSRGraph(indptr=np.zeros(n + 1, dtype=np.int64),
                 indices=np.zeros(0, dtype=np.int32),
                 out_degrees=rng.integers(0, 50, n).astype(np.int32))
    store_f32 = FeatureStore({"features": feats})
    store_q = quantize_store(store_f32, chunk=100)
    assert store_q.is_quantized(["features"])
    assert store_q.fields["features"].dtype == np.int8

    c_ref = FeatureCache(store_f32, ["features"], g, dtype="int8")
    c_q = FeatureCache(store_q, ["features"], g, dtype="int8")
    np.testing.assert_array_equal(c_q.dequant_scale, c_ref.dequant_scale)
    c_ref.fill(capacity=100)
    c_q.fill(capacity=100)
    np.testing.assert_array_equal(np.asarray(c_q.cache_values),
                                  np.asarray(c_ref.cache_values))

    nids = rng.integers(0, n, size=48).astype(np.int32)
    mask = np.ones(48, dtype=bool)
    p_ref = c_ref.fetch_plan(nids, mask)
    p_q = c_q.fetch_plan(nids, mask)
    np.testing.assert_array_equal(p_q.miss_feats, p_ref.miss_feats)

    # f32 consumers see dequantized rows within scale/2 of the original
    back = store_q.gather(["features"], np.arange(n))
    scale = store_q.scales["features"]
    assert back.dtype == np.float32
    assert np.all(np.abs(back - feats) <= scale[None, :] * 0.5 + 1e-7)


def test_prequantized_store_trainer(learn_ds):
    """End-to-end: Trainer over a pre-quantized store == Trainer over the
    f32 store with int8 cache dtype (identical trajectories — both paths
    quantize with the same store-wide scale)."""
    from pagraph_tpu.storage.feature_store import quantize_store

    tr_a = Trainer.from_dataset(_cfg("int8"), learn_ds, seed=0)
    tr_a.train(2)
    store_q = quantize_store(
        FeatureStore.build(learn_ds.graph, learn_ds.features))
    assert store_q.is_quantized(["features"])
    assert store_q.fields["norm"].dtype == np.float32   # 1-col passthrough
    tr_b = Trainer(_cfg("int8"), store_q, learn_ds.graph,
                   learn_ds.train_nids, learn_ds.labels, seed=0)
    tr_b.train(2)
    la = [m.mean_loss for m in tr_a.epoch_metrics]
    lb = [m.mean_loss for m in tr_b.epoch_metrics]
    np.testing.assert_allclose(la, lb, rtol=1e-6)
