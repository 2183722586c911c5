"""Multi-device data parallelism on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.parallel import DataParallelTrainer, make_mesh


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(
        num_nodes=1200, num_edges=10000, feat_dim=32, num_classes=6,
        seed=9, learnable=True,
    )


def _cfg(**kw):
    m = pg.ModelConfig(arch=kw.pop("arch", "gcn"), n_layers=1, hidden=16,
                       feat_dim=32, n_classes=6)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=4, method=kw.pop("method", "dg"),
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1),
    )
    for k, v in kw.items():
        setattr(cfg.cache, k, v)
    return cfg


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(4)
    assert mesh.devices.size == 4


@pytest.mark.parametrize("method", ["dg", "hash"])
def test_dp_training_reduces_loss(learn_ds, method):
    mesh = make_mesh(4)
    cfg = _cfg(method=method)
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


def test_dp_with_partial_cache(learn_ds):
    mesh = make_mesh(4)
    cfg = _cfg(capacity=40)
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(2)
    assert 0.0 < tr.epoch_metrics[-1].miss_rate < 1.0
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0]


def test_dp_matches_single_device_loss_scale(learn_ds):
    """DP mean loss should land in the same ballpark as single-device
    training on the same number of total samples (sanity, not exactness:
    partitions/sampling differ)."""
    from pagraph_tpu.train.loop import Trainer

    cfg1 = _cfg()
    single = Trainer.from_dataset(cfg1, learn_ds, seed=0)
    single.train(3)
    mesh = make_mesh(4)
    cfg2 = _cfg()
    dp = DataParallelTrainer.from_dataset(cfg2, learn_ds, mesh=mesh, seed=0)
    dp.train(3)
    s_loss = single.epoch_metrics[-1].mean_loss
    d_loss = dp.epoch_metrics[-1].mean_loss
    assert d_loss < s_loss * 2.5 + 0.5, (s_loss, d_loss)


def test_dp_state_replicated_params_identical(learn_ds):
    """After a step, every device must hold identical parameters."""
    mesh = make_mesh(2)
    cfg = _cfg()
    cfg.partition.num_parts = 2
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(1)
    w = tr.state.params["updates"][0]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_graphsage(learn_ds):
    mesh = make_mesh(4)
    cfg = _cfg(arch="graphsage")
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(2)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0]


def test_dp_gat(learn_ds):
    mesh = make_mesh(4)
    cfg = _cfg(arch="gat")
    cfg.model.num_heads = 2
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(2)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0]


def test_dp_on_device_gin(learn_ds):
    mesh = make_mesh(4)
    cfg = _cfg(arch="gin")
    cfg.model.dropout = 0.0
    cfg.train.on_device_sampling = True
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses


def test_dp_on_device_gat(learn_ds):
    mesh = make_mesh(4)
    cfg = _cfg(arch="gat")
    cfg.model.num_heads = 2
    cfg.model.dropout = 0.0
    cfg.train.on_device_sampling = True
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses


def test_dp_checkpoint_resume(learn_ds, tmp_path):
    """Crash/resume on the multi-chip on-device path: a run resumed from
    epoch 1's checkpoint reproduces the uninterrupted trajectory (epoch keys
    fold by absolute epoch; rng rides in the checkpointed state)."""
    mesh = make_mesh(4)

    def cfg_with(ckpt_dir):
        cfg = _cfg()
        cfg.train.on_device_sampling = True
        cfg.train.ckpt_dir = ckpt_dir
        cfg.train.ckpt_every = 1
        return cfg

    ck = str(tmp_path / "dpck")
    tr = DataParallelTrainer.from_dataset(cfg_with(ck), learn_ds,
                                          mesh=mesh, seed=3)
    tr.train(4)
    full = [m.mean_loss for m in tr.epoch_metrics]

    ck2 = str(tmp_path / "dpck2")
    tr1 = DataParallelTrainer.from_dataset(cfg_with(ck2), learn_ds,
                                           mesh=mesh, seed=3)
    tr1.train(2)
    tr2 = DataParallelTrainer.from_dataset(cfg_with(ck2), learn_ds,
                                           mesh=mesh, seed=3)
    start = tr2.resume()
    assert start == 2
    tr2.train(4, start_epoch=start)
    resumed = [m.mean_loss for m in tr2.epoch_metrics]
    np.testing.assert_allclose(resumed, full[2:], rtol=1e-5)


def test_dp_eval_every(learn_ds):
    mesh = make_mesh(4)
    cfg = _cfg()
    cfg.train.eval_every = 2
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=mesh, seed=0)
    s = tr.train(2)
    assert tr.epoch_metrics[-1].val_acc is not None
    assert s["val_acc"] > 1.5 / 6


def test_dp_isolation_mode_matches_local_quality(learn_ds):
    """Multi-chip isolation mode (reference pa_iso at multi-GPU scale): one
    shared-memory sampler-process pool per chip. Different worker scheduling
    means a different batch order than the in-process sampler, so compare
    converged quality, not trajectories."""
    import pagraph_tpu as pg
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    accs = {}
    for iso in (False, True):
        cfg = pg.Config(
            model=m,
            sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                     num_hops=m.num_sampled_hops, seed=2),
            partition=pg.PartitionConfig(num_parts=2, method="hash",
                                         num_hops=m.num_sampled_hops),
            train=pg.TrainConfig(lr=1e-2, remote_sampling=iso),
        )
        tr = DataParallelTrainer.from_dataset(cfg, learn_ds,
                                              mesh=make_mesh(2), seed=0)
        tr.train(4)
        losses = [e.mean_loss for e in tr.epoch_metrics]
        assert losses[-1] < losses[0], (iso, losses)
        accs[iso] = tr.epoch_metrics[-1].mean_acc
    assert abs(accs[True] - accs[False]) < 0.15, accs


def test_dp_one2all_dispatch(learn_ds):
    """one2all isolation: ONE sampler pool over the full graph round-robins
    batches to every chip (the reference's cache_server topology,
    dataloader.py:113-147). Identity partitions; per-chip caches over the
    full vertex space."""
    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=2, method="hash",
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, remote_sampling=True),
    )
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=make_mesh(2),
                                          seed=0, dispatch="one2all")
    try:
        tr.train(4)
        losses = [e.mean_loss for e in tr.epoch_metrics]
        assert losses[-1] < losses[0], losses
        # identity partitions: every chip sees the full vertex space
        assert all(p.num_nodes == learn_ds.num_nodes for p in tr.parts)
        # together the chips consume the whole train set per epoch
        n_train = len(learn_ds.train_nids)
        per_chip = tr.samplers[0].num_batches
        assert per_chip * 2 * 64 >= n_train
    finally:
        tr._one2all_service.close()


def test_one2all_requires_isolation():
    ds = synthetic_dataset(num_nodes=300, num_edges=2000, feat_dim=16,
                           num_classes=4, seed=1)
    cfg = pg.Config(
        model=pg.ModelConfig(arch="gcn", n_layers=1, hidden=8, feat_dim=16,
                             n_classes=4),
        sampler=pg.SamplerConfig(batch_size=32, fanout=2, num_hops=2),
        partition=pg.PartitionConfig(num_parts=2, method="hash", num_hops=2),
        train=pg.TrainConfig(lr=1e-2),
    )
    with pytest.raises(ValueError, match="one2all"):
        DataParallelTrainer.from_dataset(cfg, ds, mesh=make_mesh(2), seed=0,
                                         dispatch="one2all")
