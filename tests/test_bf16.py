"""bfloat16 feature storage: training works, memory halves, accuracy holds."""
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(num_nodes=800, num_edges=6000, feat_dim=32,
                             num_classes=6, seed=5, learnable=True)


def _cfg(dtype):
    m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4),
        cache=pg.CacheConfig(dtype=dtype, capacity=200),
        train=pg.TrainConfig(lr=1e-2),
    )


def test_bf16_cache_trains_close_to_f32(learn_ds):
    results = {}
    for dtype in ("float32", "bfloat16"):
        tr = Trainer.from_dataset(_cfg(dtype), learn_ds, seed=0)
        tr.train(3)
        results[dtype] = [m.mean_loss for m in tr.epoch_metrics]
        if dtype == "bfloat16":
            import ml_dtypes
            assert tr.cache.cache_values.dtype == np.dtype(ml_dtypes.bfloat16) or \
                str(tr.cache.cache_values.dtype) == "bfloat16"
    # bf16 features perturb the trajectory only slightly
    f32, bf16 = results["float32"], results["bfloat16"]
    assert bf16[-1] < bf16[0]                     # still converges
    assert abs(bf16[-1] - f32[-1]) < 0.25 * max(f32[-1], 0.2), (f32, bf16)


def test_bf16_ici_mode(learn_ds):
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    cfg = _cfg("bfloat16")
    cfg.partition.num_parts = 4
    cfg.partition.method = "hash"
    mesh = make_mesh(4)
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0,
                                          feature_source="ici")
    tr.train(2)
    assert str(tr._feat_shards.dtype) == "bfloat16"
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] + 0.2


@pytest.mark.parametrize("on_device", [False, True])
def test_bf16_compute_dtype_trains(learn_ds, on_device):
    """train.dtype='bfloat16': fwd/bwd in bf16 (cast_apply), f32 master
    params/optimizer; convergence close to f32 on the learnable graph."""
    m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6, dropout=0.0)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4),
        train=pg.TrainConfig(lr=2e-2, dtype="bfloat16",
                             on_device_sampling=on_device),
    )
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [em.mean_loss for em in tr.epoch_metrics]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    # master params stayed f32
    import jax
    assert all(p.dtype == np.float32
               for p in jax.tree.leaves(tr.state.params))


def test_bad_compute_dtype_rejected():
    with pytest.raises(ValueError):
        pg.Config(train=pg.TrainConfig(dtype="float16"))


def test_bf16_auto_capacity_doubles(learn_ds, monkeypatch):
    """auto_capacity must budget with the cache row's OWN itemsize: a bf16
    cache fits 2x the vertices of an f32 one in the same free HBM
    (VERDICT r1: dividing by total_dim*4 silently halved the bf16 tier)."""
    from pagraph_tpu.storage.cache import FeatureCache
    from pagraph_tpu.storage.feature_store import FeatureStore
    from pagraph_tpu.utils import platform

    monkeypatch.setattr(platform, "free_hbm_bytes",
                        lambda device=None, reserve=0: 1_000_000)
    store = FeatureStore.build(learn_ds.graph, learn_ds.features)
    caps = {}
    for dtype in ("float32", "bfloat16"):
        cache = FeatureCache(store, ["features"], learn_ds.graph, dtype=dtype)
        caps[dtype] = cache.auto_capacity(reserve_bytes=0)
    assert caps["bfloat16"] in (2 * caps["float32"],
                                2 * caps["float32"] + 1), caps
