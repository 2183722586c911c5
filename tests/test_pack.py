"""Packed transfer round trips: full and lean (device-plan) layouts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pagraph_tpu.config import SamplerConfig
from pagraph_tpu.sampling.pack import make_layout, pack, unpack, unpack_numpy
from pagraph_tpu.sampling.sampler import sample_minibatch
from pagraph_tpu.storage.cache import FeatureCache
from pagraph_tpu.storage.feature_store import FeatureStore


def _make(tiny_ds, capacity=30):
    cfg = SamplerConfig(batch_size=32, fanout=3, num_hops=2, seed=5)
    caps = cfg.layer_capacities(tiny_ds.graph.num_nodes)
    rng = np.random.default_rng(1)
    mb = sample_minibatch(tiny_ds.graph, np.arange(32), cfg, caps, rng,
                          labels=tiny_ds.labels)
    store = FeatureStore.build(tiny_ds.graph, tiny_ds.features)
    cache = FeatureCache(store, ["features"], tiny_ds.graph)
    cache.fill(capacity=capacity)
    plan = cache.fetch_plan(np.asarray(mb.input_nids),
                            np.asarray(mb.input_mask))
    return cfg, caps, mb, plan, cache


def test_full_layout_roundtrip(tiny_ds):
    cfg, caps, mb, plan, cache = _make(tiny_ds)
    layout = make_layout(caps, cfg.fanout, cache.total_dim,
                         plan.miss_feats.shape[0])
    i32, u8, f32 = pack(mb, plan, layout)
    mb2, plan2 = unpack(layout, jnp.asarray(i32), jnp.asarray(u8),
                        jnp.asarray(f32))
    for a, b in zip(mb.layer_nids, mb2.layer_nids):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(mb.layer_mask, mb2.layer_mask):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for ba, bb in zip(mb.blocks, mb2.blocks):
        np.testing.assert_array_equal(np.asarray(ba.neigh_pos), np.asarray(bb.neigh_pos))
        np.testing.assert_array_equal(np.asarray(ba.neigh_mask), np.asarray(bb.neigh_mask))
        np.testing.assert_array_equal(np.asarray(ba.self_pos), np.asarray(bb.self_pos))
    np.testing.assert_array_equal(np.asarray(mb.labels), np.asarray(mb2.labels))
    np.testing.assert_array_equal(np.asarray(plan.hit_mask), np.asarray(plan2.hit_mask))
    np.testing.assert_allclose(np.asarray(plan.miss_feats), np.asarray(plan2.miss_feats))
    # host-side decode agrees too
    mb3 = unpack_numpy(layout, i32, u8)
    np.testing.assert_array_equal(np.asarray(mb3.layer_nids[0]),
                                  np.asarray(mb.layer_nids[0]))


def test_lean_layout_feature_assembly_equivalence(tiny_ds):
    """Lean layout + device-side plan reconstruct the same batch features as
    the host-side FetchPlan path."""
    from pagraph_tpu.storage.cache import (
        assemble_features,
        assemble_features_from_map,
    )

    cfg, caps, mb, plan, cache = _make(tiny_ds, capacity=40)
    lean = make_layout(caps, cfg.fanout, cache.total_dim,
                       plan.miss_feats.shape[0], device_plan=True)
    i32, u8, f32 = pack(mb, plan, lean)
    assert lean.i32_size < make_layout(caps, cfg.fanout, cache.total_dim,
                                       plan.miss_feats.shape[0]).i32_size
    mb2, none = unpack(lean, jnp.asarray(i32), jnp.asarray(u8),
                       jnp.asarray(f32))
    assert none is None
    # the fields the compiled step reads must round-trip exactly
    np.testing.assert_array_equal(np.asarray(mb2.input_nids),
                                  np.asarray(mb.input_nids))
    np.testing.assert_array_equal(np.asarray(mb2.input_mask),
                                  np.asarray(mb.input_mask))
    np.testing.assert_array_equal(np.asarray(mb2.seed_mask),
                                  np.asarray(mb.seed_mask))
    np.testing.assert_array_equal(np.asarray(mb2.labels), np.asarray(mb.labels))
    for ba, bb in zip(mb.blocks, mb2.blocks):
        np.testing.assert_array_equal(np.asarray(ba.neigh_pos), np.asarray(bb.neigh_pos))
        np.testing.assert_array_equal(np.asarray(ba.neigh_mask), np.asarray(bb.neigh_mask))
        np.testing.assert_array_equal(np.asarray(ba.self_pos), np.asarray(bb.self_pos))
    want = np.asarray(assemble_features(cache.cache_values, plan))
    got = np.asarray(assemble_features_from_map(
        cache.cache_values, cache.cache_map_dev,
        mb2.input_nids, mb2.input_mask, jnp.asarray(f32),
    ))
    mask = np.asarray(mb.input_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6)
