"""Sampler invariants: subset property, edge validity, masking, capacities."""
import numpy as np
import pytest

from pagraph_tpu.config import SamplerConfig
from pagraph_tpu.sampling.sampler import NeighborSampler, sample_minibatch


def _full_edge_set(g):
    edges = set()
    for v in range(g.num_nodes):
        for u in g.in_neighbors(v):
            edges.add((int(u), int(v)))
    return edges


@pytest.mark.parametrize("fanout,hops", [(2, 1), (2, 2), (4, 2), (3, 3)])
def test_minibatch_invariants(tiny_ds, fanout, hops):
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=32, fanout=fanout, num_hops=hops, seed=11)
    caps = cfg.layer_capacities(g.num_nodes)
    rng = np.random.default_rng(0)
    seeds = rng.choice(g.num_nodes, size=32, replace=False)
    mb = sample_minibatch(g, seeds, cfg, caps, rng, labels=tiny_ds.labels)

    assert len(mb.layer_nids) == hops + 1
    assert len(mb.blocks) == hops
    edges = _full_edge_set(g)

    for i, block in enumerate(mb.blocks):
        src_ids = np.asarray(mb.layer_nids[i])
        src_mask = np.asarray(mb.layer_mask[i])
        dst_ids = np.asarray(mb.layer_nids[i + 1])
        dst_mask = np.asarray(mb.layer_mask[i + 1])
        n_src, n_dst = src_mask.sum(), dst_mask.sum()

        # subset invariant: dst set is the prefix of the src layer
        np.testing.assert_array_equal(src_ids[:n_dst], dst_ids[:n_dst])
        # self_pos points at the dst vertex itself in the src layer
        sp = np.asarray(block.self_pos)[:n_dst]
        np.testing.assert_array_equal(src_ids[sp], dst_ids[:n_dst])
        # every valid sampled edge is a real graph edge
        npos = np.asarray(block.neigh_pos)
        nmask = np.asarray(block.neigh_mask)
        assert not nmask[n_dst:].any()           # padded rows fully masked
        for d in range(n_dst):
            for k in range(fanout):
                if nmask[d, k]:
                    u = int(src_ids[npos[d, k]])
                    v = int(dst_ids[d])
                    assert (u, v) in edges
                    assert npos[d, k] < n_src
        # vertices with in-degree > 0 must have at least one sampled edge
        degs = np.diff(g.indptr)[dst_ids[:n_dst]]
        assert np.all(nmask[:n_dst].any(axis=1) == (degs > 0))

    # layer ids within each valid region are unique
    for ids, m in zip(mb.layer_nids, mb.layer_mask):
        valid = np.asarray(ids)[np.asarray(m)]
        assert len(np.unique(valid)) == len(valid)

    # labels match seeds
    n_seed = np.asarray(mb.seed_mask).sum()
    np.testing.assert_array_equal(
        np.asarray(mb.labels)[:n_seed],
        tiny_ds.labels[np.asarray(mb.layer_nids[-1])[:n_seed]],
    )


def test_small_degree_takes_all_neighbors(tiny_ds):
    """Vertices with degree <= fanout must get every in-neighbor exactly once."""
    g = tiny_ds.graph
    fanout = 64  # larger than any degree in the tiny graph -> exact sampling
    cfg = SamplerConfig(batch_size=16, fanout=fanout, num_hops=1, seed=5)
    caps = cfg.layer_capacities(g.num_nodes)
    rng = np.random.default_rng(1)
    seeds = np.arange(16)
    mb = sample_minibatch(g, seeds, cfg, caps, rng)
    block = mb.blocks[0]
    src_ids = np.asarray(mb.layer_nids[0])
    for d, v in enumerate(seeds):
        nbrs = sorted(int(u) for u in g.in_neighbors(v))
        got = sorted(
            int(src_ids[p])
            for p, m in zip(np.asarray(block.neigh_pos)[d], np.asarray(block.neigh_mask)[d])
            if m
        )
        assert got == nbrs


def test_epoch_covers_all_train_nids(tiny_ds):
    cfg = SamplerConfig(batch_size=32, fanout=2, num_hops=2, seed=9)
    sampler = NeighborSampler(
        tiny_ds.graph, tiny_ds.train_nids, cfg, labels=tiny_ds.labels,
        backend="numpy",
    )
    seen = []
    for mb in sampler.epoch():
        n = np.asarray(mb.seed_mask).sum()
        seen.append(np.asarray(mb.layer_nids[-1])[:n])
    seen = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(seen, np.sort(tiny_ds.train_nids))


def test_capacity_overflow_masks_edges():
    """With cap_factor tiny, sampling still succeeds; overflow edges masked."""
    from pagraph_tpu.data.synthetic import synthetic_dataset
    ds = synthetic_dataset(num_nodes=500, num_edges=8000, feat_dim=8, seed=2)
    cfg = SamplerConfig(batch_size=64, fanout=8, num_hops=2, cap_factor=0.3, seed=3)
    caps = cfg.layer_capacities(ds.graph.num_nodes)
    rng = np.random.default_rng(4)
    mb = sample_minibatch(ds.graph, np.arange(64), cfg, caps, rng)
    for i, block in enumerate(mb.blocks):
        n_src = np.asarray(mb.layer_mask[i]).sum()
        npos = np.asarray(block.neigh_pos)
        nmask = np.asarray(block.neigh_mask)
        assert npos[nmask].max(initial=0) < n_src  # no dangling positions
