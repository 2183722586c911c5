"""End-to-end training slice: loss decreases, cache path == direct path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(
        num_nodes=800, num_edges=6000, feat_dim=32, num_classes=6,
        seed=5, learnable=True,
    )


def _cfg(arch="gcn", **model_kw):
    m = pg.ModelConfig(arch=arch, n_layers=1, hidden=24, feat_dim=32,
                       n_classes=6, **model_kw)
    c = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4),
        train=pg.TrainConfig(lr=1e-2, epochs=4, warmup_epochs=1),
    )
    return c


@pytest.mark.parametrize("arch", ["gcn", "graphsage"])
def test_training_reduces_loss(learn_ds, arch):
    cfg = _cfg(arch)
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    assert tr.epoch_metrics[-1].miss_rate == 0.0  # tiny graph fully cached


def test_training_with_partial_cache_matches_full(learn_ds):
    """Same seed, cache capacity 50 vs full: identical loss trajectory
    (the cache must be semantically invisible)."""
    runs = []
    for capacity in (50, None):
        cfg = _cfg("gcn")
        cfg.cache.capacity = capacity
        tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
        tr.train(2)
        runs.append([m.mean_loss for m in tr.epoch_metrics])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-5)


def test_cache_disabled_matches_enabled(learn_ds):
    runs = []
    for enabled in (False, True):
        cfg = _cfg("gcn")
        cfg.cache.enabled = enabled
        tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
        tr.train(2)
        runs.append([m.mean_loss for m in tr.epoch_metrics])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-5)
    assert runs[0] == runs[0]


def test_gcn_preprocess_trains(learn_ds):
    cfg = _cfg("gcn", preprocess=True)
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses


def test_sage_preprocess_trains(learn_ds):
    cfg = _cfg("graphsage", preprocess=True)
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses


def test_summary_shape(learn_ds):
    cfg = _cfg("gcn")
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    s = tr.train(3)
    assert s["epochs"] == 3
    assert s["mean_epoch_time_s"] > 0
    assert "step" in s["phase_timers"]


def test_eval_every_records_val_acc(learn_ds):
    """Online validation eval (beyond-reference: eval.py is offline-only)."""
    cfg = _cfg("gcn")
    cfg.train.eval_every = 2
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    s = tr.train(4)
    accs = [m.val_acc for m in tr.epoch_metrics]
    assert accs[0] is None and accs[2] is None           # off-epochs
    assert accs[1] is not None and accs[3] is not None   # every 2nd
    assert s["val_acc"] == accs[3]
    assert accs[3] > 1.5 / 6                             # beats chance
    assert accs[3] >= accs[1] - 0.1                      # roughly improving


def test_eval_every_on_device_path(learn_ds):
    cfg = _cfg("gcn")
    cfg.train.eval_every = 3
    cfg.train.on_device_sampling = True
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(3)
    assert tr.epoch_metrics[-1].val_acc is not None
    assert tr.epoch_metrics[-1].val_acc > 1.5 / 6


def test_eval_every_accepts_preprocess():
    """Round 2: full-graph inference recomputes the layer-0 aggregation
    exactly, so preprocess configs evaluate too (test_inference.py
    test_preprocess_eval_works covers the math)."""
    pg.Config(
        model=pg.ModelConfig(arch="gcn", n_layers=1, hidden=8,
                             feat_dim=16, n_classes=5, preprocess=True),
        sampler=pg.SamplerConfig(batch_size=32, fanout=2, num_hops=1),
        train=pg.TrainConfig(eval_every=2),
    ).validate()


def test_cosine_lr_schedule_trains():
    """Beyond-reference cosine decay: trains, and the optimizer count drives
    the schedule (validated config contract)."""
    from pagraph_tpu.data.synthetic import synthetic_dataset
    from pagraph_tpu.train.loop import Trainer

    ds = synthetic_dataset(num_nodes=600, num_edges=5000, feat_dim=16,
                           num_classes=5, seed=13, learnable=True)
    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=12, feat_dim=16,
                       n_classes=5)
    steps = (-(-len(ds.train_nids) // 128)) * 4
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=3),
        train=pg.TrainConfig(lr=1e-2, lr_schedule="cosine",
                             lr_decay_steps=steps),
    )
    tr = Trainer.from_dataset(cfg, ds, seed=0)
    tr.train(4)
    losses = [e.mean_loss for e in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses
    with pytest.raises(ValueError, match="lr_decay_steps"):
        pg.Config(model=m,
                  sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                           num_hops=m.num_sampled_hops),
                  train=pg.TrainConfig(lr_schedule="cosine")).validate()
