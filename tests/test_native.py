"""Native C++ sampler/gather: equivalence with the numpy reference backend."""
import numpy as np
import pytest

from pagraph_tpu.config import SamplerConfig

native = pytest.importorskip("pagraph_tpu.sampling.native")


def _invariants(mb, g, fanout):
    for i, block in enumerate(mb.blocks):
        src_ids = np.asarray(mb.layer_nids[i])
        src_mask = np.asarray(mb.layer_mask[i])
        dst_ids = np.asarray(mb.layer_nids[i + 1])
        dst_mask = np.asarray(mb.layer_mask[i + 1])
        n_src, n_dst = src_mask.sum(), dst_mask.sum()
        np.testing.assert_array_equal(src_ids[:n_dst], dst_ids[:n_dst])
        sp = np.asarray(block.self_pos)[:n_dst]
        np.testing.assert_array_equal(src_ids[sp], dst_ids[:n_dst])
        npos = np.asarray(block.neigh_pos)
        nmask = np.asarray(block.neigh_mask)
        assert not nmask[n_dst:].any()
        edges = set()
        for v in range(g.num_nodes):
            for u in g.in_neighbors(v):
                edges.add((int(u), int(v)))
        for d in range(n_dst):
            for k in range(fanout):
                if nmask[d, k]:
                    assert (int(src_ids[npos[d, k]]), int(dst_ids[d])) in edges
                    assert npos[d, k] < n_src
        degs = np.diff(g.indptr)[dst_ids[:n_dst]]
        assert np.all(nmask[:n_dst].any(axis=1) == (degs > 0))


@pytest.mark.parametrize("fanout,hops", [(2, 2), (4, 1), (3, 3)])
def test_native_sampler_invariants(tiny_ds, fanout, hops):
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=32, fanout=fanout, num_hops=hops)
    caps = cfg.layer_capacities(g.num_nodes)
    ns = native.NativeSampler(g, cfg, caps)
    mb = ns.sample(np.arange(32, dtype=np.int64), tiny_ds.labels, seed=123)
    _invariants(mb, g, fanout)
    n_seed = np.asarray(mb.seed_mask).sum()
    np.testing.assert_array_equal(
        np.asarray(mb.labels)[:n_seed],
        tiny_ds.labels[np.asarray(mb.layer_nids[-1])[:n_seed]],
    )


def test_native_matches_numpy_with_full_fanout(tiny_ds):
    """With fanout >= max degree both backends must take ALL neighbors, so
    the edge sets (though not orderings) are identical."""
    from pagraph_tpu.sampling.sampler import sample_minibatch

    g = tiny_ds.graph
    fanout = int(np.diff(g.indptr).max())
    cfg = SamplerConfig(batch_size=16, fanout=fanout, num_hops=2)
    caps = cfg.layer_capacities(g.num_nodes)
    seeds = np.arange(16, dtype=np.int64)
    ns = native.NativeSampler(g, cfg, caps)
    mb_n = ns.sample(seeds, None, seed=1)
    rng = np.random.default_rng(2)
    mb_p = sample_minibatch(g, seeds, cfg, caps, rng)

    def edge_set(mb):
        out = set()
        for i, b in enumerate(mb.blocks):
            src = np.asarray(mb.layer_nids[i])
            dst = np.asarray(mb.layer_nids[i + 1])
            npos, nm = np.asarray(b.neigh_pos), np.asarray(b.neigh_mask)
            for d in range(int(np.asarray(mb.layer_mask[i + 1]).sum())):
                for k in range(nm.shape[1]):
                    if nm[d, k]:
                        out.add((i, int(src[npos[d, k]]), int(dst[d])))
        return out

    assert edge_set(mb_n) == edge_set(mb_p)
    # layer vertex SETS also agree (ordering may differ)
    for ln, lp, mn, mp_ in zip(mb_n.layer_nids, mb_p.layer_nids,
                               mb_n.layer_mask, mb_p.layer_mask):
        a = np.sort(np.asarray(ln)[np.asarray(mn)])
        b = np.sort(np.asarray(lp)[np.asarray(mp_)])
        np.testing.assert_array_equal(a, b)


def test_native_scratch_reusable(tiny_ds):
    """Back-to-back samples must not corrupt each other via the scratch map."""
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=16, fanout=3, num_hops=2)
    caps = cfg.layer_capacities(g.num_nodes)
    ns = native.NativeSampler(g, cfg, caps)
    for s in range(5):
        mb = ns.sample(np.arange(16, dtype=np.int64) + s, None, seed=s)
        _invariants(mb, g, 3)
    assert (ns._pos_of == -1).all()


def test_gather_rows_matches_take(tiny_ds):
    ids = np.array([5, 0, 199, 42], dtype=np.int64)
    out = native.gather_rows_f32(tiny_ds.features, ids)
    np.testing.assert_array_equal(out, tiny_ds.features[ids])


def test_sampler_auto_backend_uses_native(tiny_ds):
    from pagraph_tpu.sampling.sampler import NeighborSampler

    cfg = SamplerConfig(batch_size=32, fanout=2, num_hops=2, backend="auto")
    s = NeighborSampler(tiny_ds.graph, tiny_ds.train_nids, cfg,
                        labels=tiny_ds.labels)
    assert s._native is not None
    mbs = list(s.epoch())
    seen = np.concatenate([
        np.asarray(mb.layer_nids[-1])[np.asarray(mb.seed_mask)] for mb in mbs
    ])
    np.testing.assert_array_equal(np.sort(seen), np.sort(tiny_ds.train_nids))
