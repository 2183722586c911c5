"""Access-frequency cache ranking: refill after a probe epoch improves (or
matches) the degree-ranked hit rate."""
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.train.loop import Trainer


def test_access_freq_refill_improves_hit_rate():
    # skewed graph so frequency != out-degree ordering on the sampled set
    ds = synthetic_dataset(num_nodes=1500, num_edges=20000, feat_dim=16,
                           num_classes=5, seed=17, kind="rmat",
                           learnable=True)
    results = {}
    for rank_by in ("out_degree", "access_freq"):
        cfg = pg.Config(
            model=pg.ModelConfig(arch="gcn", n_layers=1, hidden=8,
                                 feat_dim=16, n_classes=5),
            sampler=pg.SamplerConfig(batch_size=128, fanout=2, num_hops=2,
                                     seed=3),
            cache=pg.CacheConfig(capacity=150, rank_by=rank_by),
            train=pg.TrainConfig(lr=1e-2),
        )
        tr = Trainer.from_dataset(cfg, ds, seed=0)
        tr.train(3)
        # epoch 0 is the probe epoch for access_freq; compare steady state
        results[rank_by] = tr.epoch_metrics[-1].miss_rate
    assert results["access_freq"] <= results["out_degree"] + 0.02, results


def test_access_counts_tracked():
    ds = synthetic_dataset(num_nodes=300, num_edges=2000, feat_dim=8,
                           num_classes=4, seed=2)
    cfg = pg.Config(
        model=pg.ModelConfig(arch="gcn", n_layers=1, hidden=8, feat_dim=8,
                             n_classes=4),
        sampler=pg.SamplerConfig(batch_size=64, fanout=2, num_hops=2),
        cache=pg.CacheConfig(capacity=50, rank_by="access_freq"),
    )
    tr = Trainer.from_dataset(cfg, ds, seed=0)
    tr.train(1)
    assert tr.cache.access_counts.sum() > 0
