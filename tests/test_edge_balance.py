"""Edge-balanced dg partitioning + edge-mode padding-skew accounting
(VERDICT r2 #4: per-chip HBM in edge mode is max_p(E_p), not E/P — hub-
heavy graphs skew badly under the reference's vertex-count balance)."""
import numpy as np
import pytest
import scipy.sparse as spsp

import pagraph_tpu as pg
from pagraph_tpu.data.formats import Dataset
from pagraph_tpu.graph import CSRGraph
from pagraph_tpu.partition.dg_part import dg_assign, dg_partition


def hub_heavy_graph(n=1200, hubs=6, hub_deg=250, base_edges=4000, seed=3):
    """A few train-set hubs hold most of the in-edges; everything else is a
    sparse uniform background."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=base_edges, dtype=np.int64)
    dst = rng.integers(0, n, size=base_edges, dtype=np.int64)
    hub_dst = np.repeat(np.arange(hubs, dtype=np.int64), hub_deg)
    hub_src = rng.integers(hubs, n, size=hubs * hub_deg, dtype=np.int64)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, hub_dst])
    keep = src != dst
    coo = spsp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (dst[keep], src[keep])),
        shape=(n, n))
    return CSRGraph.from_coo(coo)


@pytest.fixture(scope="module")
def hub_ds():
    graph = hub_heavy_graph()
    n = graph.num_nodes
    rng = np.random.default_rng(4)
    feats = rng.random((n, 16), dtype=np.float32)
    labels = rng.integers(0, 5, size=n).astype(np.int64)
    train = np.zeros(n, dtype=bool)
    train[:n // 2] = True          # hubs 0..5 are train vertices
    val = np.zeros(n, dtype=bool)
    val[n // 2: n // 2 + 100] = True
    test = ~train & ~val
    return Dataset(graph, feats, labels, train, val, test)


def _edge_skew(parts):
    e = np.array([p.graph.num_edges for p in parts], dtype=np.float64)
    return float(e.max() / max(e.mean(), 1.0)), e


def test_edge_balance_reduces_skew(hub_ds):
    plain = dg_partition(hub_ds.graph, hub_ds.train_nids, hub_ds.labels,
                         4, 1)
    bal = dg_partition(hub_ds.graph, hub_ds.train_nids, hub_ds.labels,
                       4, 1, edge_balance=True)
    skew_plain, e_plain = _edge_skew(plain)
    skew_bal, e_bal = _edge_skew(bal)
    assert skew_bal < skew_plain, (e_plain, e_bal)
    # documented bound: with edge_balance the padded per-chip structure is
    # within k=1.5x of the ideal E_total/P split on this hub-heavy graph
    assert skew_bal <= 1.5, e_bal


def test_edge_balance_native_matches_numpy(hub_ds):
    train = hub_ds.train_nids
    for parts, hops in [(2, 1), (4, 1), (3, 2)]:
        ref = dg_assign(hub_ds.graph, train, parts, hops, backend="numpy",
                        edge_balance=True)
        nat = dg_assign(hub_ds.graph, train, parts, hops, backend="native",
                        edge_balance=True)
        np.testing.assert_array_equal(ref, nat)


def test_plain_assignment_unchanged_by_weight_refactor(hub_ds):
    """The float-accumulator refactor must not perturb the reference
    formula: weights=None output is identical across backends and equals
    the classic integer-count stream."""
    ref = dg_assign(hub_ds.graph, hub_ds.train_nids, 4, 1, backend="numpy")
    nat = dg_assign(hub_ds.graph, hub_ds.train_nids, 4, 1, backend="native")
    np.testing.assert_array_equal(ref, nat)


def _edge_mode_cfg():
    m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=8, feat_dim=16,
                       n_classes=5)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=1),
        partition=pg.PartitionConfig(num_parts=4, method="dg", num_hops=2),
        train=pg.TrainConfig(lr=1e-2, on_device_sampling=True),
    )


def test_skew_warning_and_memory_accounting(hub_ds):
    """A skewed dg partition must warn at trainer construction, expose the
    skew ratio, and still train; per-chip structure bytes stay within the
    padded bound 8-align(max_e)*4 + (max_n+1)*4."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    from pagraph_tpu.storage.feature_store import FeatureStore

    # deliberately skewed assignment (the warning tests the TRAINER's
    # accounting, not dg's greedy): all hubs + a big chunk in part 0
    from pagraph_tpu.partition.utils import extract_partition

    train = hub_ds.train_nids
    chunks = [np.sort(train[: len(train) // 2])]          # hubs live here
    rest = train[len(train) // 2:]
    chunks += [np.sort(rest[i::3]) for i in range(3)]
    parts = [extract_partition(hub_ds.graph, c, hub_ds.labels, 1)
             for c in chunks]
    skew, e_parts = _edge_skew(parts)
    assert skew > 1.5, e_parts      # the fixture is genuinely skewed
    store = FeatureStore.build(hub_ds.graph, hub_ds.features)
    with pytest.warns(RuntimeWarning, match="edge skew"):
        tr = DataParallelTrainer(
            _edge_mode_cfg(), store, parts, mesh=make_mesh(4), seed=0,
            feature_source="edge", full_graph=hub_ds.graph,
            full_train_nids=hub_ds.train_nids, full_labels=hub_ds.labels,
            full_val_mask=hub_ds.val_mask, full_features=hub_ds.features,
        )
    assert tr.structure_skew == pytest.approx(skew)
    max_e8 = -(-max(int(e) for e in e_parts) // 8) * 8
    D = 4
    max_n = max(p.num_nodes for p in parts)
    per_chip = (tr._dev_indptr.nbytes + tr._dev_indices.nbytes) // D
    assert per_chip <= (max_n + 1) * 4 + max_e8 * 4
    tr.train(2)
    assert np.isfinite(tr.epoch_metrics[-1].mean_loss)


def test_edge_balanced_partition_trains_without_warning(hub_ds):
    """edge_balance partitions pass through trainer construction quietly
    (skew under the 1.5 warning threshold) and train fine."""
    import warnings

    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    from pagraph_tpu.storage.feature_store import FeatureStore

    parts = dg_partition(hub_ds.graph, hub_ds.train_nids, hub_ds.labels,
                         4, 1, edge_balance=True)
    skew, e_parts = _edge_skew(parts)
    store = FeatureStore.build(hub_ds.graph, hub_ds.features)
    cfg = _edge_mode_cfg()
    cfg.partition.edge_balance = True
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        tr = DataParallelTrainer(
            cfg, store, parts, mesh=make_mesh(4), seed=0,
            feature_source="edge", full_graph=hub_ds.graph,
            full_train_nids=hub_ds.train_nids, full_labels=hub_ds.labels,
            full_val_mask=hub_ds.val_mask, full_features=hub_ds.features,
        )
    tr.train(2)
    assert np.isfinite(tr.epoch_metrics[-1].mean_loss)
