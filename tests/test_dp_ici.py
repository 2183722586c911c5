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
    assert tr._halo_drops == 0


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
