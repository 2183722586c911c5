"""On-device sampler + whole-epoch on-device training path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.sampling.device_sampler import (
    DeviceCSR, sample_hop, sample_minibatch_device,
)
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(
        num_nodes=800, num_edges=6000, feat_dim=32, num_classes=6,
        seed=5, learnable=True,
    )


def _cfg(arch="gcn", **model_kw):
    m = pg.ModelConfig(arch=arch, n_layers=1, hidden=24, feat_dim=32,
                       n_classes=6, **model_kw)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=4),
        train=pg.TrainConfig(lr=1e-2, epochs=4, warmup_epochs=1,
                             on_device_sampling=True),
    )


def test_sample_hop_policy(tiny_ds):
    """Per-vertex policy matches the host sampler: deg==0 all-masked,
    deg<=fanout exact take-all, deg>fanout all slots valid in-neighbors."""
    g = tiny_ds.graph
    csr = DeviceCSR.from_graph(g)
    fanout = 3
    dst = jnp.arange(g.num_nodes, dtype=jnp.int32)
    mask = jnp.ones(g.num_nodes, dtype=bool)
    nbr, m = sample_hop(csr, dst, mask, fanout, jax.random.PRNGKey(0))
    nbr, m = np.asarray(nbr), np.asarray(m)
    deg = g.in_degrees
    for v in range(g.num_nodes):
        true_nbrs = set(g.in_neighbors(v).tolist())
        if deg[v] == 0:
            assert not m[v].any()
        elif deg[v] <= fanout:
            assert m[v].sum() == deg[v]
            assert set(nbr[v][m[v]].tolist()) == true_nbrs
        else:
            assert m[v].all()
            assert set(nbr[v].tolist()) <= true_nbrs


def test_sample_hop_masked_dst(tiny_ds):
    csr = DeviceCSR.from_graph(tiny_ds.graph)
    dst = jnp.arange(16, dtype=jnp.int32)
    mask = jnp.zeros(16, dtype=bool).at[:8].set(True)
    _, m = sample_hop(csr, dst, mask, 2, jax.random.PRNGKey(1))
    assert not np.asarray(m)[8:].any()


def test_minibatch_invariants(tiny_ds):
    """Prefix-subset layering, block-local positions, label gather."""
    g = tiny_ds.graph
    csr = DeviceCSR.from_graph(g)
    B, hops, fanout = 32, 2, 2
    seeds = jnp.asarray(tiny_ds.train_nids[:B].astype(np.int32))
    smask = jnp.ones(B, dtype=bool)
    labels = jnp.asarray(tiny_ds.labels.astype(np.int32))
    mb = sample_minibatch_device(csr, seeds, smask, hops, fanout,
                                 jax.random.PRNGKey(2), labels=labels)
    assert mb.num_hops == hops
    # widths: B*(fanout+1)^(hops-i)
    for i, nids in enumerate(mb.layer_nids):
        assert nids.shape[0] == B * (fanout + 1) ** (hops - i)
    # inner layer is a PREFIX of the outer layer
    for i in range(hops):
        outer = np.asarray(mb.layer_nids[i])
        inner = np.asarray(mb.layer_nids[i + 1])
        np.testing.assert_array_equal(outer[: len(inner)], inner)
        blk = mb.blocks[i]
        np.testing.assert_array_equal(np.asarray(blk.self_pos),
                                      np.arange(len(inner)))
        # every valid neighbor position points at the actual sampled id and
        # is a true in-neighbor of its destination
        npos = np.asarray(blk.neigh_pos)
        nmask = np.asarray(blk.neigh_mask)
        for d in np.flatnonzero(np.asarray(mb.layer_mask[i + 1]))[:40]:
            true_nbrs = set(g.in_neighbors(inner[d]).tolist())
            for k in range(fanout):
                if nmask[d, k]:
                    assert outer[npos[d, k]] in true_nbrs
    np.testing.assert_array_equal(
        np.asarray(mb.labels), tiny_ds.labels[np.asarray(seeds)]
    )


@pytest.mark.parametrize("arch,pre", [("gcn", False), ("graphsage", False),
                                      ("graphsage", True)])
def test_on_device_training_reduces_loss(learn_ds, arch, pre):
    cfg = _cfg(arch, preprocess=pre)
    cfg.sync_hops()
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    em = tr.epoch_metrics[-1]
    assert em.miss_rate == 0.0
    nb = -(-len(learn_ds.train_nids) // cfg.sampler.batch_size)
    assert em.num_batches == nb
    assert em.edges > 0 and em.vertices > 0


def test_on_device_matches_host_quality(learn_ds):
    """Different RNG streams, same distribution: both paths should converge
    to comparable training accuracy on the learnable dataset."""
    accs = []
    for on_device in (False, True):
        cfg = _cfg("gcn")
        cfg.train.on_device_sampling = on_device
        tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
        tr.train(5)
        accs.append(tr.epoch_metrics[-1].mean_acc)
    assert abs(accs[0] - accs[1]) < 0.15, accs


def test_on_device_deterministic(learn_ds):
    runs = []
    for _ in range(2):
        cfg = _cfg("gcn")
        tr = Trainer.from_dataset(cfg, learn_ds, seed=3)
        tr.train(2)
        runs.append([m.mean_loss for m in tr.epoch_metrics])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-6)


def test_on_device_unroll_equivalent(learn_ds):
    """scan_unroll is a pure scheduling knob: same trajectory bit-for-bit,
    including when the step count does not divide the unroll factor
    (800 seeds / batch 128 = 7 steps, unroll 4)."""
    runs = []
    for unroll in (1, 4):
        cfg = _cfg("gcn")
        cfg.train.scan_unroll = unroll
        tr = Trainer.from_dataset(cfg, learn_ds, seed=3)
        tr.train(2)
        runs.append([m.mean_loss for m in tr.epoch_metrics])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-6)


def test_paired_draws_policy(tiny_ds):
    """paired=True (row-gather windows): masks match the generic path
    bit-for-bit, every sampled value is a valid in-neighbor, and per-slot
    marginals are uniform (the XOR candidate map is an involution on
    absolute positions, so the out-of-range fallback restores its mass)."""
    g = tiny_ds.graph
    csr = DeviceCSR.from_graph(g)
    dst = jnp.arange(g.num_nodes, dtype=jnp.int32)
    ones = jnp.ones(g.num_nodes, dtype=bool)
    deg = g.in_degrees

    nbr_g, m_g = sample_hop(csr, dst, ones, 2, jax.random.PRNGKey(0))
    nbr_p, m_p = sample_hop(csr, dst, ones, 2, jax.random.PRNGKey(0),
                            paired=True)
    nbr_p, m_p = np.asarray(nbr_p), np.asarray(m_p)
    np.testing.assert_array_equal(m_p, np.asarray(m_g))
    for v in range(g.num_nodes):
        valid = nbr_p[v][m_p[v]]
        assert set(valid.tolist()) <= set(g.in_neighbors(v).tolist()), v

    # marginal uniformity over many keys, including small-degree vertices
    # (deg <= fanout now draws WITH replacement — still uniform per slot)
    big = np.nonzero(deg > 2)[0]
    two = np.nonzero(deg == 2)[0]
    picks = list(big[:4]) + list(two[:1])
    # per-SLOT counts: slots within a window are correlated (the fallback
    # can duplicate), so each slot's marginal is tested on its own —
    # counts across keys are then iid binomial
    counts = {int(v): np.zeros((2, g.num_nodes), dtype=np.int64)
              for v in picks}
    K = 400
    sample = jax.jit(lambda k: sample_hop(csr, dst, ones, 2, k, paired=True))
    for i in range(K):
        nbr, m = sample(jax.random.PRNGKey(100 + i))
        nbr = np.asarray(nbr)
        for v in counts:
            assert set(nbr[v].tolist()) <= set(g.in_neighbors(v).tolist())
            counts[v][0][nbr[v][0]] += 1
            counts[v][1][nbr[v][1]] += 1
    for v, c in counts.items():
        nbrs = g.in_neighbors(v)
        expected = 1.0 / deg[v]
        sigma = np.sqrt(expected * (1 - expected) / K)
        for s in range(2):
            freq = c[s][nbrs] / K
            assert np.all(np.abs(freq - expected) < 4.5 * sigma + 1e-9), (
                v, s, freq, expected)


def test_paired_draws_training_runs(learn_ds):
    cfg = _cfg("gcn")
    cfg.sampler.paired_draws = True
    tr = Trainer.from_dataset(cfg, learn_ds, seed=3)
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0]


def test_prefix_layout_equivalent_to_gather(tiny_ds):
    """prefix_layout blocks aggregate bit-identically to the generic
    pos-gather path (the device sampler's layout promise)."""
    import dataclasses
    from pagraph_tpu.ops.aggregate import (
        block_aggregate, block_aggregate_lstm, block_self, init_lstm_params,
    )

    csr = DeviceCSR.from_graph(tiny_ds.graph)
    seeds = jnp.arange(32, dtype=jnp.int32)
    mb = sample_minibatch_device(csr, seeds, jnp.ones(32, bool), 2, 3,
                                 jax.random.PRNGKey(7))
    h = jnp.asarray(
        np.random.default_rng(0).random((mb.layer_nids[0].shape[0], 16),
                                        dtype=np.float32))
    lstm_p = init_lstm_params(jax.random.PRNGKey(1), 16, 16)
    for blk in mb.blocks:
        assert blk.prefix_layout
        gen = dataclasses.replace(blk, prefix_layout=False)
        np.testing.assert_array_equal(
            np.asarray(block_self(h, blk)), np.asarray(block_self(h, gen)))
        for kind in ("mean", "sum", "max"):
            np.testing.assert_array_equal(
                np.asarray(block_aggregate(h, blk, kind)),
                np.asarray(block_aggregate(h, gen, kind)))
        np.testing.assert_array_equal(
            np.asarray(block_aggregate_lstm(h, blk, lstm_p)),
            np.asarray(block_aggregate_lstm(h, gen, lstm_p)))
        h = block_aggregate(h, blk, "mean")


def test_on_device_requires_full_cache(learn_ds):
    cfg = _cfg("gcn")
    cfg.cache.capacity = 50
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    with pytest.raises(ValueError, match="full feature set"):
        tr.run_epoch(0)


def test_config_rejects_conflicts():
    with pytest.raises(ValueError, match="exclusive"):
        pg.Config(train=pg.TrainConfig(on_device_sampling=True,
                                       remote_sampling=True))
    with pytest.raises(ValueError, match="cache.enabled"):
        pg.Config(cache=pg.CacheConfig(enabled=False),
                  train=pg.TrainConfig(on_device_sampling=True))


# -- multi-chip on-device mode (8-virtual-device CPU mesh) -------------------

@pytest.fixture(scope="module")
def dp_ds():
    return synthetic_dataset(
        num_nodes=1200, num_edges=10000, feat_dim=32, num_classes=6,
        seed=9, learnable=True,
    )


@pytest.mark.parametrize("method", ["dg", "hash"])
def test_dp_on_device_training(dp_ds, method):
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    mesh = make_mesh(4)
    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=4, method=method,
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                             on_device_sampling=True),
    )
    tr = DataParallelTrainer.from_dataset(cfg, dp_ds, mesh=mesh, seed=0)
    tr.train(4)
    losses = [m_.mean_loss for m_ in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    em = tr.epoch_metrics[-1]
    assert em.miss_rate == 0.0
    assert em.edges > 0
    # lockstep step count = max over chips of ceil(n_train_r / B)
    assert em.num_batches == tr._dev_num_batches


def test_ici_on_device_training(dp_ds):
    """Full-graph on-device sampling + ICI-sharded features: loss decreases,
    halo drops stay rare, epoch runs as one dispatch."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    mesh = make_mesh(4)
    m = pg.ModelConfig(arch="gcn", n_layers=1, hidden=16, feat_dim=32,
                       n_classes=6)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops, seed=2),
        partition=pg.PartitionConfig(num_parts=4,
                                     num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                             on_device_sampling=True),
    )
    tr = DataParallelTrainer.from_dataset(cfg, dp_ds, mesh=mesh, seed=0,
                                          feature_source="ici")
    tr.train(4)
    losses = [m_.mean_loss for m_ in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    em = tr.epoch_metrics[-1]
    assert em.num_batches == tr._dev_num_batches
    total_verts = sum(m_.vertices for m_ in tr.epoch_metrics)
    assert tr.halo_drops <= 0.05 * total_verts, (tr.halo_drops, total_verts)


def test_device_halo_plan_matches_host():
    """In-jit halo plan == host HaloPlanner for the same inputs."""
    import jax.numpy as jnp

    from pagraph_tpu.parallel.halo import HaloPlanner, device_halo_plan

    rng = np.random.default_rng(0)
    P, rows, H, cap0 = 4, 50, 16, 64
    nids = rng.integers(0, P * rows, size=cap0)
    mask = rng.random(cap0) < 0.9
    host = HaloPlanner(P, rows, H).plan(nids, mask)
    dev = device_halo_plan(jnp.asarray(nids.astype(np.int32)),
                           jnp.asarray(mask), rows, P, H)
    np.testing.assert_array_equal(np.asarray(dev.req), host.req)
    np.testing.assert_array_equal(np.asarray(dev.valid), host.valid)
    # slots must agree wherever valid
    np.testing.assert_array_equal(np.asarray(dev.slot)[host.valid],
                                  host.slot[host.valid])


def test_cv_gcn_on_device_training(learn_ds):
    """Control-variate GCN fully on device: histories + exact agg refresh
    live in HBM; loss decreases and tracks the host CV path."""
    accs = []
    for on_device in (False, True):
        m = pg.ModelConfig(arch="gcn_cv", n_layers=1, hidden=24, feat_dim=32,
                           n_classes=6, preprocess=True)
        cfg = pg.Config(
            model=m,
            sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                     num_hops=m.num_sampled_hops, seed=4),
            train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                                 on_device_sampling=on_device),
        )
        tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
        tr.train(5)
        losses = [e.mean_loss for e in tr.epoch_metrics]
        assert losses[-1] < losses[0] * 0.9, (on_device, losses)
        accs.append(tr.epoch_metrics[-1].mean_acc)
    assert abs(accs[0] - accs[1]) < 0.2, accs


@pytest.mark.parametrize("fanout", [4, 5, 12])
def test_paired_draws_general_fanout(tiny_ds, fanout):
    """Paired draws at fanout > 2: masks match the generic path, sampled
    values are valid in-neighbors, per-slot marginals are uniform."""
    g = tiny_ds.graph
    csr = DeviceCSR.from_graph(g)
    dst = jnp.arange(g.num_nodes, dtype=jnp.int32)
    ones = jnp.ones(g.num_nodes, dtype=bool)
    deg = g.in_degrees

    nbr_g, m_g = sample_hop(csr, dst, ones, fanout, jax.random.PRNGKey(0))
    nbr_p, m_p = sample_hop(csr, dst, ones, fanout, jax.random.PRNGKey(0),
                            paired=True)
    nbr_p, m_p = np.asarray(nbr_p), np.asarray(m_p)
    np.testing.assert_array_equal(m_p, np.asarray(m_g))
    for v in range(g.num_nodes):
        valid = nbr_p[v][m_p[v]]
        assert set(valid.tolist()) <= set(g.in_neighbors(v).tolist()), v

    big = np.nonzero(deg > fanout)[0]
    counts = {int(v): np.zeros((fanout, g.num_nodes), dtype=np.int64)
              for v in big[:4]}
    K = 300
    sample = jax.jit(
        lambda k: sample_hop(csr, dst, ones, fanout, k, paired=True))
    for i in range(K):
        nbr, m = sample(jax.random.PRNGKey(500 + i))
        nbr = np.asarray(nbr)
        for v in counts:
            assert set(nbr[v].tolist()) <= set(g.in_neighbors(v).tolist())
            for f in range(fanout):
                counts[v][f][nbr[v][f]] += 1
    for v, c in counts.items():
        nbrs = g.in_neighbors(v)
        expected = 1.0 / deg[v]
        sigma = np.sqrt(expected * (1 - expected) / K)
        for s in range(fanout):
            freq = c[s][nbrs] / K
            assert np.all(np.abs(freq - expected) < 4.8 * sigma + 1e-9), (
                v, s, freq, expected)


def test_paired_draws_degenerate_partition():
    """< 2 edges: paired must fall back to the generic path, not crash at
    trace time (dynamic_slice of size 2 needs a 2-element indices array)."""
    from pagraph_tpu.graph import CSRGraph

    import scipy.sparse as sp
    coo = sp.coo_matrix(([True], ([1], [0])), shape=(4, 4))
    g = CSRGraph.from_coo(coo)
    csr = DeviceCSR.from_graph(g)
    dst = jnp.arange(4, dtype=jnp.int32)
    ones = jnp.ones(4, dtype=bool)
    nbr_p, m_p = sample_hop(csr, dst, ones, 2, jax.random.PRNGKey(0),
                            paired=True)
    nbr_g, m_g = sample_hop(csr, dst, ones, 2, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(nbr_p), np.asarray(nbr_g))
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_g))


def test_paired_draws_accuracy_ab(learn_ds):
    """Accuracy A/B: paired row-gather draws vs independent draws at a
    fanout-5 shape (ADVICE r1: window-correlated slots could hurt accuracy
    — validate, don't assume). Same seeds, same epochs; final val accuracy
    must agree within noise."""
    from pagraph_tpu.models.inference import evaluate

    accs = {}
    for paired in (False, True):
        cfg = _cfg("graphsage")
        cfg.sampler.fanout = 5
        cfg.sampler.paired_draws = paired
        cfg.train.on_device_sampling = True
        tr = Trainer.from_dataset(cfg, learn_ds, seed=3)
        tr.train(4)
        accs[paired] = evaluate(
            jax.device_get(tr.state.params), cfg.model, learn_ds.graph,
            learn_ds.features, learn_ds.labels, learn_ds.val_mask)
    assert accs[True] > 0.5 and accs[False] > 0.5, accs
    assert abs(accs[True] - accs[False]) < 0.06, accs


@pytest.mark.parametrize("arch", ["gat", "gin"])
def test_on_device_gat_gin(learn_ds, arch):
    """The beyond-reference model families ride the on-device epoch too."""
    cfg = _cfg(arch)
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(3)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses


def test_chunked_gather_epoch_trajectory_identical(monkeypatch):
    """Driving the chunked-gather path inside a real on-device epoch (chunk
    shrunk so toy shapes split) must reproduce the monolithic trajectory
    bit-for-bit — the split is scheduling, not semantics."""
    import pagraph_tpu as pg
    import pagraph_tpu.ops.gather as gather_mod
    from pagraph_tpu.data.synthetic import synthetic_dataset
    from pagraph_tpu.train.loop import Trainer

    ds = synthetic_dataset(num_nodes=500, num_edges=4000, feat_dim=16,
                           num_classes=5, seed=3, learnable=True)

    def run():
        cfg = pg.Config(
            model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=8,
                                 feat_dim=16, n_classes=5),
            sampler=pg.SamplerConfig(batch_size=64, fanout=2, num_hops=2,
                                     seed=1),
            train=pg.TrainConfig(lr=1e-2, on_device_sampling=True),
        )
        tr = Trainer.from_dataset(cfg, ds, seed=0)
        tr.train(2)
        return [m.mean_loss for m in tr.epoch_metrics]

    base = run()
    monkeypatch.setattr(gather_mod, "_CHUNK_ROWS", 64)   # cap0=576 -> splits
    chunked = run()
    np.testing.assert_array_equal(base, chunked)
