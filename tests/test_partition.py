"""Partitioner invariants: self-reliance closure, id-map round trips,
coverage, balance; partition-based training equivalence."""
import numpy as np
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.formats import load_partition, save_partition
from pagraph_tpu.partition import (
    dg_assign,
    dg_partition,
    hash_partition,
    hop_closure,
    partition_stats,
    reorder_map,
    apply_reordering,
)
from pagraph_tpu.data.synthetic import synthetic_dataset


def _check_self_reliance(full, part, hops):
    """Every vertex within hops-1 of a local train vertex must keep ALL its
    full-graph in-edges locally."""
    l2f = part.local2full
    # id-map round trip
    assert len(np.unique(l2f)) == len(l2f)
    # train ids map back to full train vertices
    full_train = l2f[part.train_nids]
    # frontier walk on the LOCAL graph mirrors the full graph
    frontier = part.train_nids
    for depth in range(hops):
        for lv in frontier[:50]:
            full_nbrs = np.sort(full.in_neighbors(l2f[lv]))
            local_nbrs = np.sort(l2f[part.graph.in_neighbors(lv)])
            np.testing.assert_array_equal(local_nbrs, full_nbrs)
        nxt = []
        for lv in frontier[:50]:
            nxt.extend(part.graph.in_neighbors(lv))
        frontier = np.unique(np.array(nxt, dtype=np.int64)) if nxt else np.array([], dtype=np.int64)
        if len(frontier) == 0:
            break
    return full_train


@pytest.mark.parametrize("method", ["hash", "dg"])
@pytest.mark.parametrize("hops", [1, 2])
def test_partitions_cover_and_self_reliant(tiny_ds, method, hops):
    P = 3
    if method == "hash":
        parts = hash_partition(tiny_ds.graph, tiny_ds.train_nids,
                               tiny_ds.labels, P, hops, seed=1)
    else:
        parts = dg_partition(tiny_ds.graph, tiny_ds.train_nids,
                             tiny_ds.labels, P, hops)
    assert len(parts) == P
    all_train = []
    for part in parts:
        ft = _check_self_reliance(tiny_ds.graph, part, hops)
        all_train.append(ft)
        # labels consistent through the map
        np.testing.assert_array_equal(
            part.labels, tiny_ds.labels[part.local2full]
        )
    covered = np.sort(np.concatenate(all_train))
    np.testing.assert_array_equal(covered, np.sort(tiny_ds.train_nids))


def test_dg_balance(tiny_ds):
    parts = dg_partition(tiny_ds.graph, tiny_ds.train_nids, tiny_ds.labels, 4, 1)
    counts = [len(p.train_nids) for p in parts]
    avg = np.mean(counts)
    assert max(counts) < 2.2 * avg, counts


def test_dg_locality_beats_hash(small_ds):
    """dg should produce smaller closures (less replication) than hash on a
    graph with structure."""
    hops = 2
    hp = hash_partition(small_ds.graph, small_ds.train_nids, small_ds.labels,
                        2, hops, seed=0)
    dp = dg_partition(small_ds.graph, small_ds.train_nids, small_ds.labels,
                      2, hops)
    hs = partition_stats(hp, small_ds.num_nodes)
    ds_ = partition_stats(dp, small_ds.num_nodes)
    assert ds_["replication_factor"] <= hs["replication_factor"] * 1.05


def test_hop_closure_matches_bfs(tiny_ds):
    g = tiny_ds.graph
    seeds = np.array([1, 2, 3])
    closure, interior = hop_closure(g, seeds, 2)
    # brute force
    s1 = set(seeds.tolist())
    for v in list(s1):
        s1.update(int(u) for u in g.in_neighbors(v))
    s2 = set(s1)
    for v in list(s1):
        s2.update(int(u) for u in g.in_neighbors(v))
    assert set(closure.tolist()) == s2
    assert set(interior.tolist()) == s1


def test_partition_artifact_roundtrip(tmp_path, tiny_ds):
    parts = hash_partition(tiny_ds.graph, tiny_ds.train_nids, tiny_ds.labels,
                           2, 1, seed=3)
    save_partition(str(tmp_path), 0, parts[0])
    loaded = load_partition(str(tmp_path), 0)
    np.testing.assert_array_equal(loaded.train_nids, parts[0].train_nids)
    np.testing.assert_array_equal(loaded.local2full, parts[0].local2full)
    np.testing.assert_array_equal(loaded.labels, parts[0].labels)
    assert loaded.graph.num_edges == parts[0].graph.num_edges


def test_reordering_preserves_graph(tiny_ds):
    vmap = reorder_map(tiny_ds.graph)
    assert np.sort(vmap).tolist() == list(range(tiny_ds.num_nodes))
    ds2 = apply_reordering(tiny_ds, vmap)
    assert ds2.graph.num_edges == tiny_ds.graph.num_edges
    # edge (u->v) exists iff (vmap[u]->vmap[v]) exists
    for v in [0, 10, 99]:
        old_nbrs = np.sort(vmap[tiny_ds.graph.in_neighbors(v)])
        new_nbrs = np.sort(ds2.graph.in_neighbors(vmap[v]))
        np.testing.assert_array_equal(old_nbrs, new_nbrs)
    # features/labels follow
    np.testing.assert_allclose(ds2.features[vmap[5]], tiny_ds.features[5])
    assert ds2.labels[vmap[5]] == tiny_ds.labels[5]
    assert ds2.train_mask[vmap[7]] == tiny_ds.train_mask[7]


def test_partition_training_runs(small_ds):
    """Train on one dg partition through the full stack."""
    from pagraph_tpu.storage.feature_store import FeatureStore
    from pagraph_tpu.train.loop import Trainer

    parts = dg_partition(small_ds.graph, small_ds.train_nids, small_ds.labels,
                         2, 2)
    store = FeatureStore.build(small_ds.graph, small_ds.features)
    cfg = pg.Config(
        model=pg.ModelConfig(arch="gcn", n_layers=1, hidden=16,
                             feat_dim=small_ds.feat_dim,
                             n_classes=small_ds.num_classes),
        sampler=pg.SamplerConfig(batch_size=64, fanout=2, num_hops=2),
        train=pg.TrainConfig(lr=1e-2),
    )
    tr = Trainer.from_partition(cfg, parts[0], store, seed=0)
    tr.train(2)
    assert tr.epoch_metrics[-1].mean_loss < 10


def test_dg_assign_native_matches_numpy():
    """pg_dg_assign (C++) must reproduce the numpy greedy stream exactly:
    same scores, same exact-equality tie handling, same closure accounting."""
    from pagraph_tpu.data.synthetic import synthetic_dataset
    from pagraph_tpu.partition.dg_part import dg_assign

    ds = synthetic_dataset(num_nodes=600, num_edges=5000, feat_dim=4,
                           num_classes=3, seed=5)
    train = np.nonzero(ds.train_mask)[0]
    for parts, hops in [(2, 1), (3, 2), (4, 2)]:
        ref = dg_assign(ds.graph, train, parts, hops, backend="numpy")
        nat = dg_assign(ds.graph, train, parts, hops, backend="native")
        np.testing.assert_array_equal(ref, nat)
