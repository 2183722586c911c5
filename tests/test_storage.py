"""Feature store + HBM cache: hit/miss assembly, ranking, miss accounting."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pagraph_tpu.config import SamplerConfig
from pagraph_tpu.sampling.sampler import sample_minibatch
from pagraph_tpu.storage.cache import FeatureCache, assemble_features, bucket_size
from pagraph_tpu.storage.feature_store import FeatureStore, full_graph_mean_aggregate


def test_store_fused_gather(tiny_ds):
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    nids = np.array([0, 5, 17, 3])
    out = store.gather(["features", "norm"], nids)
    assert out.shape == (4, tiny_ds.feat_dim + 1)
    np.testing.assert_allclose(out[:, : tiny_ds.feat_dim], tiny_ds.features[nids])
    offs = store.field_offsets(["features", "norm"])
    assert offs["norm"] == slice(tiny_ds.feat_dim, tiny_ds.feat_dim + 1)


def test_full_graph_mean_aggregate_matches_loop(tiny_ds):
    g = tiny_ds.graph
    agg = full_graph_mean_aggregate(g, tiny_ds.features)
    for v in [0, 3, 50, 120]:
        nbrs = g.in_neighbors(v)
        want = (
            tiny_ds.features[nbrs].mean(axis=0)
            if len(nbrs)
            else np.zeros(tiny_ds.feat_dim)
        )
        np.testing.assert_allclose(agg[v], want, rtol=1e-5, atol=1e-6)


def test_bucket_size():
    assert bucket_size(0, 4096) == 0
    assert bucket_size(1, 4096) == 512
    assert bucket_size(513, 4096) == 1024
    assert bucket_size(5000, 4096) == 4096


@pytest.mark.parametrize("capacity", [0, 30, 10**9])
def test_cache_assembly_matches_direct_gather(tiny_ds, capacity):
    """Whatever the capacity, assembled features == direct host gather."""
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    cache = FeatureCache(store, ["features"], tiny_ds.graph)
    cache.fill(capacity=capacity)
    cfg = SamplerConfig(batch_size=32, fanout=3, num_hops=2, seed=1)
    caps = cfg.layer_capacities(tiny_ds.graph.num_nodes)
    rng = np.random.default_rng(0)
    mb = sample_minibatch(tiny_ds.graph, np.arange(32), cfg, caps, rng)
    plan = cache.fetch_plan(np.asarray(mb.input_nids), np.asarray(mb.input_mask))
    fused = np.asarray(
        assemble_features(cache.cache_values, jax.tree.map(jnp.asarray, plan))
    )
    mask = np.asarray(mb.input_mask)
    nids = np.asarray(mb.input_nids)[mask]
    np.testing.assert_allclose(fused[mask], tiny_ds.features[nids], rtol=1e-6)


def test_cache_ranks_by_out_degree(tiny_ds):
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    cache = FeatureCache(store, ["features"], tiny_ds.graph)
    cache.fill(capacity=20)
    cached = np.nonzero(cache.cache_map >= 0)[0]
    assert len(cached) == 20
    worst_cached = tiny_ds.graph.out_degrees[cached].min()
    uncached = np.setdiff1d(np.arange(tiny_ds.graph.num_nodes), cached)
    assert tiny_ds.graph.out_degrees[uncached].max() <= worst_cached


def test_miss_rate_accounting(tiny_ds):
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    cache = FeatureCache(store, ["features"], tiny_ds.graph)
    cache.fill(capacity=10**9)  # fully cached
    cfg = SamplerConfig(batch_size=16, fanout=2, num_hops=1, seed=2)
    caps = cfg.layer_capacities(tiny_ds.graph.num_nodes)
    rng = np.random.default_rng(1)
    mb = sample_minibatch(tiny_ds.graph, np.arange(16), cfg, caps, rng)
    cache.fetch_plan(np.asarray(mb.input_nids), np.asarray(mb.input_mask))
    assert cache.miss_rate() == 0.0
    cache2 = FeatureCache(store, ["features"], tiny_ds.graph)
    cache2.fill(capacity=0)
    cache2.fetch_plan(np.asarray(mb.input_nids), np.asarray(mb.input_mask))
    assert cache2.miss_rate() == 1.0
    n_valid = int(np.asarray(mb.input_mask).sum())
    assert cache2.try_num == n_valid


def test_cache_with_id_map(tiny_ds):
    """Cache over a fake 'partition': local ids map into a shifted full space."""
    n = tiny_ds.graph.num_nodes
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    # partition = last 50 vertices, local id i -> full id i + (n - 50)
    sub_nodes = np.arange(n - 50, n)
    sub, sub2full = tiny_ds.graph.subgraph(sub_nodes)
    cache = FeatureCache(store, ["features"], sub, sub2full)
    cache.fill(capacity=10)
    local_nids = np.arange(20, dtype=np.int32)
    mask = np.ones(20, dtype=bool)
    plan = cache.fetch_plan(local_nids, mask)
    fused = np.asarray(
        assemble_features(cache.cache_values, jax.tree.map(jnp.asarray, plan))
    )
    np.testing.assert_allclose(
        fused, tiny_ds.features[sub2full[local_nids]], rtol=1e-6
    )
