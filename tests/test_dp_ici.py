"""DP training with ICI-distributed features (halo exchange mode)."""
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.parallel import DataParallelTrainer, make_mesh


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(num_nodes=1200, num_edges=10000, feat_dim=32,
                             num_classes=6, seed=9, learnable=True)


def _cfg(arch="gcn"):
    m = pg.ModelConfig(arch=arch, n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=4, method="hash",
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1),
    )


@pytest.mark.parametrize("arch", ["gcn", "graphsage"])
def test_ici_training_reduces_loss(learn_ds, arch):
    mesh = make_mesh(4)
    tr = DataParallelTrainer.from_dataset(
        _cfg(arch), learn_ds, mesh=mesh, seed=0, feature_source="ici",
    )
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    # generous default halo width: nothing dropped on this workload
    assert tr.halo_drops == 0


def test_ici_loss_close_to_cache_mode(learn_ds):
    """Same partitions/seeds: ici and cache modes differ only in where the
    features come from -> loss trajectories must match closely."""
    mesh = make_mesh(4)
    runs = []
    for src in ("cache", "ici"):
        tr = DataParallelTrainer.from_dataset(
            _cfg(), learn_ds, mesh=mesh, seed=0, feature_source=src,
        )
        tr.train(2)
        runs.append([m.mean_loss for m in tr.epoch_metrics])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-4)


def _cfg_device(arch="graphsage"):
    cfg = _cfg(arch)
    cfg.train.on_device_sampling = True
    return cfg


def test_edge_mode_trains_and_matches_cache(learn_ds):
    """EDGE-PARTITIONED on-device mode (partition CSR per chip + ICI-sharded
    features) must produce the same trajectory as the dp+cache on-device
    mode: identical partitions/seeds -> identical minibatches, and the halo
    exchange must deliver the same feature rows the per-chip full cache
    would have (VERDICT r1 #2)."""
    mesh = make_mesh(4)
    runs = {}
    for src in ("cache", "edge"):
        tr = DataParallelTrainer.from_dataset(
            _cfg_device(), learn_ds, mesh=mesh, seed=0, feature_source=src,
        )
        tr.train(3)
        runs[src] = [m.mean_loss for m in tr.epoch_metrics]
        if src == "edge":
            assert tr.halo_drops == 0
            # memory accounting: features are sharded, not replicated
            D = mesh.devices.size
            assert tr._feat_shards.shape[0] == D
            assert tr._feat_shards.shape[1] == -(-learn_ds.num_nodes // D)
    np.testing.assert_allclose(runs["cache"], runs["edge"], rtol=1e-4)
    assert runs["edge"][-1] < runs["edge"][0] * 0.9, runs


def test_edge_mode_halo_drop_warning(learn_ds, monkeypatch):
    """A deliberately narrow halo width must (a) warn loudly, (b) surface
    halo_drops in the train() summary, and (c) still complete training
    (dropped requests train on zeroed features, VERDICT r2 #5)."""
    import pagraph_tpu.parallel.halo as halo_mod
    monkeypatch.setattr(halo_mod, "halo_width_for",
                        lambda cap0, num_shards, slack=1.5: 8)
    tr = DataParallelTrainer.from_dataset(
        _cfg_device(), learn_ds, mesh=make_mesh(4), seed=0,
        feature_source="edge",
    )
    with pytest.warns(RuntimeWarning, match="halo requests overflowed"):
        summary = tr.train(2)
    assert summary["halo_drops"] > 0
    assert tr.halo_drops == summary["halo_drops"]
    assert np.isfinite(summary["final_loss"])


def test_ici_host_halo_drop_warning(learn_ds, monkeypatch):
    """Same contract on the per-batch HOST ici pipeline (HaloPlanner path)."""
    import pagraph_tpu.parallel.halo as halo_mod
    monkeypatch.setattr(halo_mod, "halo_width_for",
                        lambda cap0, num_shards, slack=1.5: 8)
    tr = DataParallelTrainer.from_dataset(
        _cfg(), learn_ds, mesh=make_mesh(4), seed=0, feature_source="ici",
    )
    with pytest.warns(RuntimeWarning, match="halo requests overflowed"):
        summary = tr.train(2)
    assert summary["halo_drops"] > 0
    assert np.isfinite(summary["final_loss"])


def test_edge_mode_requires_on_device():
    ds = synthetic_dataset(num_nodes=300, num_edges=2000, feat_dim=16,
                           num_classes=4, seed=1)
    with pytest.raises(NotImplementedError, match="on_device_sampling"):
        DataParallelTrainer.from_dataset(
            _cfg(), ds, mesh=make_mesh(4), seed=0, feature_source="edge",
        )


def test_edge_mode_paired_draws(learn_ds):
    cfg = _cfg_device()
    cfg.sampler.paired_draws = True
    tr = DataParallelTrainer.from_dataset(
        cfg, learn_ds, mesh=make_mesh(4), seed=0, feature_source="edge",
    )
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


def test_edge_mode_halo_pipeline_equivalent(learn_ds):
    """Software-pipelined edge epoch (sample+exchange batch i+1 inside
    batch i's step, SURVEY §7 overlap) must reproduce the unpipelined
    trajectory — same per-batch keys, same step order."""
    mesh = make_mesh(4)
    runs = {}
    for pipe in (False, True):
        cfg = _cfg_device()
        cfg.train.halo_pipeline = pipe
        tr = DataParallelTrainer.from_dataset(
            cfg, learn_ds, mesh=mesh, seed=0, feature_source="edge",
        )
        tr.train(3)
        runs[pipe] = [m.mean_loss for m in tr.epoch_metrics]
        assert tr.halo_drops == 0
    np.testing.assert_allclose(runs[False], runs[True], rtol=1e-5)


def test_edge_mode_sage_preprocess(learn_ds):
    """Edge mode with the preprocess trick: the 'neigh' field rides the same
    cyclic shard + halo exchange as 'features' (fused rows)."""
    m = pg.ModelConfig(arch="graphsage", n_layers=2, hidden=16, feat_dim=32,
                       n_classes=6, preprocess=True)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=4, method="hash",
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, on_device_sampling=True),
    )
    tr = DataParallelTrainer.from_dataset(
        cfg, learn_ds, mesh=make_mesh(4), seed=0, feature_source="edge")
    tr.train(3)
    losses = [e.mean_loss for e in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.7, losses
    assert tr.halo_drops == 0


@pytest.mark.parametrize("arch", ["gat", "gin"])
def test_edge_mode_gat_gin(learn_ds, arch):
    """The beyond-reference families ride the edge-partitioned epoch too."""
    m = pg.ModelConfig(arch=arch, n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=4, method="hash",
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, on_device_sampling=True),
    )
    tr = DataParallelTrainer.from_dataset(
        cfg, learn_ds, mesh=make_mesh(4), seed=0, feature_source="edge")
    tr.train(3)
    losses = [e.mean_loss for e in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses
    assert tr.halo_drops == 0


@pytest.mark.parametrize("arch", ["gat", "gin"])
def test_ici_host_mode_gat_gin(learn_ds, arch):
    """GAT/GIN on the per-batch HOST ici pipeline (features sharded across
    the mesh, halo-fetched per batch) — closes the model x mode cells
    VERDICT r3 #5 flagged as untested."""
    tr = DataParallelTrainer.from_dataset(
        _cfg(arch), learn_ds, mesh=make_mesh(4), seed=0,
        feature_source="ici",
    )
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses
    assert tr.halo_drops == 0


@pytest.mark.parametrize("arch", ["gat", "gin"])
def test_ici_device_mode_gat_gin(learn_ds, arch):
    """GAT/GIN on the on-device ici epoch (full-graph sampling in-jit +
    ICI-sharded features): the generic epoch builder special-cases only
    sage_pre, so these archs must ride it unchanged."""
    tr = DataParallelTrainer.from_dataset(
        _cfg_device(arch), learn_ds, mesh=make_mesh(4), seed=0,
        feature_source="ici",
    )
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses
    assert tr.halo_drops == 0


@pytest.mark.parametrize("arch", ["gat", "gin"])
def test_ici_matches_cache_mode_gat_gin(learn_ds, arch):
    """Same partitions/seeds: for gat/gin too, ici differs from cache mode
    only in where the feature rows live — trajectories must match."""
    mesh = make_mesh(4)
    runs = []
    for src in ("cache", "ici"):
        tr = DataParallelTrainer.from_dataset(
            _cfg(arch), learn_ds, mesh=mesh, seed=0, feature_source=src,
        )
        tr.train(2)
        runs.append([m.mean_loss for m in tr.epoch_metrics])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-4)


def test_halo_slack_config_knob(learn_ds):
    """train.halo_slack widens the static halo width (the knob the drop
    warning points at); slack < 1 is rejected by Config.validate.  (At toy
    shapes the power-of-two bucketing can saturate, so the trainer check is
    >=; the raw heuristic is strictly monotone.)"""
    from pagraph_tpu.parallel.halo import halo_width_for

    assert halo_width_for(100_000, 8, slack=3.0) > halo_width_for(
        100_000, 8, slack=1.0)
    cfg_hi = _cfg_device()
    cfg_hi.train.halo_slack = 8.0
    tr_hi = DataParallelTrainer.from_dataset(
        cfg_hi, learn_ds, mesh=make_mesh(4), seed=0, feature_source="edge")
    tr_lo = DataParallelTrainer.from_dataset(
        _cfg_device(), learn_ds, mesh=make_mesh(4), seed=0,
        feature_source="edge")
    assert tr_hi._halo_width >= tr_lo._halo_width
    with pytest.raises(ValueError, match="halo_slack"):
        bad = _cfg_device()
        bad.train.halo_slack = 0.5
        bad.validate()
