"""epoch_dispatch='steps': per-minibatch dispatches == the scan epoch.

The per-step mode is +2.6% at the [15,10,5]/b1024/h256 leaderboard shape
and compiles ~2.6x faster (BENCH_NOTES "per-step dispatch A/B"); scan
stays the default.  Correctness contract: because both modes share
`_make_batch_body` and `_epoch_schedule` (train/device_epoch.py), the
trajectories must be identical — these tests pin that.
"""
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(
        num_nodes=800, num_edges=6000, feat_dim=32, num_classes=6,
        seed=5, learnable=True,
    )


def _cfg(dispatch, paired=False):
    m = pg.ModelConfig(arch="graphsage", n_layers=2, hidden=24, feat_dim=32,
                       n_classes=6)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4,
                                 paired_draws=paired),
        train=pg.TrainConfig(lr=1e-2, epochs=3, warmup_epochs=1,
                             on_device_sampling=True,
                             epoch_dispatch=dispatch),
    )


@pytest.mark.parametrize("paired", [False, True])
def test_steps_matches_scan_trajectory(ds, paired):
    import jax

    trained = {}
    for mode in ("scan", "steps", "pipelined"):
        tr = Trainer.from_dataset(_cfg(mode, paired), ds, seed=0)
        tr.train(3)
        trained[mode] = tr
    a = trained["scan"]
    assert trained["steps"]._step_mode and not a._step_mode
    assert trained["pipelined"]._pipelined_mode
    if paired:
        # the [E/8, 8] row table must be materialized OUTSIDE jit in EVERY
        # dispatch mode: inside jit the reshape output gets a T(8,128)
        # tiled layout — 16x HBM (33.8 GB at rmat25, OOMed the one-chip
        # claim run before this was hoisted)
        for tr in trained.values():
            assert tr._dev_csr.indices_rows is not None
    pa = jax.device_get(a.state.params)
    for mode in ("steps", "pipelined"):
        b = trained[mode]
        for ea, eb in zip(a.epoch_metrics, b.epoch_metrics):
            assert ea.num_batches == eb.num_batches
            assert ea.edges == eb.edges
            assert ea.vertices == eb.vertices
            np.testing.assert_allclose(ea.mean_loss, eb.mean_loss, rtol=1e-5)
            np.testing.assert_allclose(ea.mean_acc, eb.mean_acc, rtol=1e-5)
        pb = jax.device_get(b.state.params)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-5,
                                                    atol=1e-6),
            pa, pb)
        assert (int(jax.device_get(b.state.step))
                == 3 * a.epoch_metrics[0].num_batches)


def test_steps_loss_decreases(ds):
    tr = Trainer.from_dataset(_cfg("steps"), ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


def test_steps_requires_on_device():
    with pytest.raises(ValueError, match="on-device"):
        pg.Config(train=pg.TrainConfig(epoch_dispatch="steps"))
    with pytest.raises(ValueError, match="scan|steps"):
        pg.Config(train=pg.TrainConfig(epoch_dispatch="bogus"))


def test_steps_rejects_cv(ds):
    m = pg.ModelConfig(arch="gcn_cv", n_layers=2, hidden=16, feat_dim=32,
                       n_classes=6, preprocess=True)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(on_device_sampling=True,
                             epoch_dispatch="steps"),
    )
    with pytest.raises(ValueError, match="gcn_cv"):
        Trainer.from_dataset(cfg, ds, seed=0)


def test_steps_rejects_multichip(ds):
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops),
        partition=pg.PartitionConfig(num_parts=4,
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(on_device_sampling=True,
                             epoch_dispatch="steps"),
    )
    with pytest.raises(NotImplementedError, match="single-chip"):
        DataParallelTrainer.from_dataset(cfg, ds, mesh=make_mesh(4), seed=0)
