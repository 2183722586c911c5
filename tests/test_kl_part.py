"""KL partitioner: bisection quality, balance, recursion, artifact
invariants (reference intent: the absent kl_2partition module imported by
PaGraph/partition/__init__.py:1)."""
import numpy as np
import pytest
import scipy.sparse as spsp

from pagraph_tpu.graph import CSRGraph
from pagraph_tpu.partition import (
    hash_partition,
    kl_assign,
    kl_partition,
    partition_stats,
)
from pagraph_tpu.partition.kl_part import cut_weight, kl_bisect, train_affinity

from tests.test_partition import _check_self_reliance


def _planted_graph(k=40, p_in=0.4, p_out=0.02, seed=0):
    """Two dense clusters with sparse cross links; returns (graph, labels)."""
    rng = np.random.default_rng(seed)
    n = 2 * k
    block = np.zeros((n, n))
    block[:k, :k] = rng.random((k, k)) < p_in
    block[k:, k:] = rng.random((k, k)) < p_in
    cross = rng.random((n, n)) < p_out
    block[:k, k:] = cross[:k, k:]
    block[k:, :k] = cross[k:, :k]
    np.fill_diagonal(block, 0)
    return CSRGraph.from_coo(spsp.coo_matrix(block)), k


def test_kl_bisect_recovers_planted_clusters():
    graph, k = _planted_graph()
    n = graph.num_nodes
    train = np.arange(n, dtype=np.int64)
    w = train_affinity(graph, train, hops=1)
    side = kl_bisect(w, target0=k, seed=1)
    # sides match the planted clusters (up to relabeling): at most a couple
    # of strays on an 80-vertex planted bisection
    planted = np.zeros(n, dtype=bool)
    planted[k:] = True
    mismatch = min(np.sum(side != planted), np.sum(side == planted))
    assert mismatch <= 4, mismatch


def test_kl_bisect_improves_random_cut():
    graph, k = _planted_graph(k=60, seed=3)
    train = np.arange(graph.num_nodes, dtype=np.int64)
    w = train_affinity(graph, train, hops=1)
    rng = np.random.default_rng(0)
    rand = np.zeros(graph.num_nodes, dtype=bool)
    rand[rng.permutation(graph.num_nodes)[k:]] = True
    side = kl_bisect(w, target0=k, seed=0)
    assert cut_weight(w, side) < cut_weight(w, rand)


def test_kl_bisect_balance():
    graph, _ = _planted_graph(k=50, seed=5)
    train = np.arange(graph.num_nodes, dtype=np.int64)
    w = train_affinity(graph, train, hops=2)
    target0 = 50
    side = kl_bisect(w, target0=target0, seed=2, tol=0.02)
    count0 = int((~side).sum())
    assert abs(count0 - target0) <= max(1, int(round(0.02 * graph.num_nodes)))


@pytest.mark.parametrize("num_parts", [2, 3, 4])
def test_kl_assign_covers_balanced(tiny_ds, num_parts):
    belongs = kl_assign(tiny_ds.graph, tiny_ds.train_nids, num_parts, 2)
    assert belongs.shape == (len(tiny_ds.train_nids),)
    assert set(np.unique(belongs)) <= set(range(num_parts))
    counts = np.bincount(belongs, minlength=num_parts)
    assert counts.min() > 0
    assert counts.max() <= 1.5 * counts.mean(), counts


@pytest.mark.parametrize("hops", [1, 2])
def test_kl_partitions_cover_and_self_reliant(tiny_ds, hops):
    P = 2
    parts = kl_partition(tiny_ds.graph, tiny_ds.train_nids, tiny_ds.labels,
                         P, hops, seed=1)
    assert len(parts) == P
    all_train = []
    for part in parts:
        ft = _check_self_reliance(tiny_ds.graph, part, hops)
        all_train.append(ft)
        np.testing.assert_array_equal(
            part.labels, tiny_ds.labels[part.local2full]
        )
    covered = np.sort(np.concatenate(all_train))
    np.testing.assert_array_equal(covered, np.sort(tiny_ds.train_nids))


def test_kl_locality_beats_hash(small_ds):
    """KL's min-cut objective should produce no more replication than the
    random (hash) baseline on a graph with structure."""
    hops = 2
    hp = hash_partition(small_ds.graph, small_ds.train_nids, small_ds.labels,
                        2, hops, seed=0)
    kp = kl_partition(small_ds.graph, small_ds.train_nids, small_ds.labels,
                      2, hops, seed=0)
    hs = partition_stats(hp, small_ds.num_nodes)
    ks = partition_stats(kp, small_ds.num_nodes)
    assert ks["replication_factor"] <= hs["replication_factor"] * 1.05


def test_dp_trainer_routes_kl_method():
    """DataParallelTrainer.from_dataset must actually use kl_partition for
    method='kl' (it silently fell through to hash before round 2)."""
    from unittest import mock

    import pagraph_tpu as pg
    from pagraph_tpu.data.synthetic import synthetic_dataset
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    import pagraph_tpu.partition as part_pkg

    ds = synthetic_dataset(num_nodes=400, num_edges=3000, feat_dim=16,
                           num_classes=4, seed=2, learnable=True)
    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=8, feat_dim=16,
                       n_classes=4)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=32, fanout=2,
                                 num_hops=m.num_sampled_hops),
        partition=pg.PartitionConfig(num_parts=2, method="kl", num_hops=2),
        train=pg.TrainConfig(lr=1e-2),
    )
    with mock.patch.object(part_pkg, "kl_partition",
                           wraps=part_pkg.kl_partition) as spy:
        DataParallelTrainer.from_dataset(cfg, ds, mesh=make_mesh(2), seed=0)
    assert spy.called
