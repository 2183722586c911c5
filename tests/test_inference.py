"""Full-graph inference + checkpoint replay."""
import numpy as np
import jax
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.models import get_model
from pagraph_tpu.models.inference import evaluate, full_graph_logits
from pagraph_tpu.train.checkpoint import (
    evaluate_checkpoints,
    list_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(num_nodes=600, num_edges=5000, feat_dim=16,
                             num_classes=5, seed=13, learnable=True)


def _mcfg(arch, **kw):
    return pg.ModelConfig(arch=arch, n_layers=1, hidden=12, feat_dim=16,
                          n_classes=5, **kw)


@pytest.mark.parametrize("arch,agg", [("gcn", "mean"), ("graphsage", "mean"),
                                      ("graphsage", "gcn"), ("graphsage", "pool")])
def test_full_graph_logits_match_manual(learn_ds, arch, agg):
    """Layer-wise propagation must equal a brute-force per-vertex compute."""
    cfg = _mcfg(arch, aggregator=agg)
    init_fn, _ = get_model(cfg)
    params = init_fn(jax.random.PRNGKey(1), cfg)
    logits = full_graph_logits(params, cfg, learn_ds.graph, learn_ds.features)
    assert logits.shape == (learn_ds.num_nodes, 5)
    g = learn_ds.graph

    def np_linear(p, x):
        return x @ np.asarray(p["w"]) + np.asarray(p["b"])

    # brute-force two-layer forward for a few vertices
    feats = learn_ds.features
    # layer 0 for all vertices (needed as input to layer 1)
    h0 = np.zeros((g.num_nodes, 24), dtype=np.float32)  # 12*2 after concat
    for v in range(g.num_nodes):
        nbrs = g.in_neighbors(v)
        if arch == "gcn":
            aggv = feats[nbrs].sum(0) / max(len(nbrs), 1) if len(nbrs) else np.zeros(16)
            out = np_linear(params["updates"][0], aggv.astype(np.float32))
        else:
            if len(nbrs) == 0:
                aggv = np.zeros(16, np.float32)
            elif agg == "mean":
                aggv = feats[nbrs].mean(0)
            elif agg == "gcn":
                aggv = feats[nbrs].sum(0)
            else:
                aggv = feats[nbrs].max(0)
            out = (np_linear(params["updates"][0]["self"], feats[v])
                   + np_linear(params["updates"][0]["neigh"], aggv.astype(np.float32)))
        h0[v] = np.concatenate([out, np.maximum(out, 0)])
    for v in [0, 17, 300]:
        nbrs = g.in_neighbors(v)
        if arch == "gcn":
            aggv = h0[nbrs].sum(0) / max(len(nbrs), 1) if len(nbrs) else np.zeros(24)
            want = np_linear(params["updates"][1], aggv.astype(np.float32))
        else:
            if len(nbrs) == 0:
                aggv = np.zeros(24, np.float32)
            elif agg == "mean":
                aggv = h0[nbrs].mean(0)
            elif agg == "gcn":
                aggv = h0[nbrs].sum(0)
            else:
                aggv = h0[nbrs].max(0)
            want = (np_linear(params["updates"][1]["self"], h0[v])
                    + np_linear(params["updates"][1]["neigh"], aggv.astype(np.float32)))
        np.testing.assert_allclose(logits[v], want, rtol=1e-3, atol=1e-4)


def test_trained_model_beats_chance(learn_ds):
    cfg = pg.Config(
        model=_mcfg("graphsage"),
        sampler=pg.SamplerConfig(batch_size=128, fanout=3, num_hops=2),
        train=pg.TrainConfig(lr=1e-2),
    )
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(5)
    acc = evaluate(jax.device_get(tr.state).params, cfg.model, learn_ds.graph,
                   learn_ds.features, learn_ds.labels, learn_ds.test_mask)
    assert acc > 0.35, acc  # 5 classes -> chance is 0.2


def test_checkpoint_roundtrip_and_replay(tmp_path, learn_ds):
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = pg.Config(
        model=_mcfg("gcn"),
        sampler=pg.SamplerConfig(batch_size=128, fanout=2, num_hops=2),
        train=pg.TrainConfig(lr=1e-2, ckpt_dir=ckpt_dir, ckpt_every=1),
    )
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(3)
    assert list_checkpoints(ckpt_dir, "gcn") == [0, 1, 2]
    restored = restore_checkpoint(ckpt_dir, "gcn", 2, jax.device_get(tr.state))
    np.testing.assert_allclose(
        np.asarray(restored.params["updates"][0]["w"]),
        np.asarray(jax.device_get(tr.state).params["updates"][0]["w"]),
    )
    results = evaluate_checkpoints(
        cfg, ckpt_dir, learn_ds.graph, learn_ds.features,
        learn_ds.labels, learn_ds.test_mask,
    )
    assert set(results) == {0, 1, 2}
    assert all(0.0 <= v <= 1.0 for v in results.values())


def test_trainer_resume(tmp_path, learn_ds):
    """Crash/resume: a run resumed from epoch-1's checkpoint continues with
    the saved params (same step counter, finite training)."""
    ckpt_dir = str(tmp_path / "ck")
    cfg = pg.Config(
        model=_mcfg("gcn"),
        sampler=pg.SamplerConfig(batch_size=128, fanout=2, num_hops=2),
        train=pg.TrainConfig(lr=1e-2, ckpt_dir=ckpt_dir, ckpt_every=1),
    )
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(2)
    saved_step = int(jax.device_get(tr.state).step)
    tr2 = Trainer.from_dataset(cfg, learn_ds, seed=0)
    start = tr2.resume()
    assert start == 2
    assert int(jax.device_get(tr2.state).step) == saved_step
    tr2.train(3, start_epoch=start)
    assert tr2.epoch_metrics[-1].epoch == 2
    assert np.isfinite(tr2.epoch_metrics[-1].mean_loss)


@pytest.mark.parametrize("arch,agg", [("gcn", "mean"), ("graphsage", "mean"),
                                      ("graphsage", "gcn"),
                                      ("graphsage", "pool")])
def test_device_backend_matches_host(learn_ds, arch, agg):
    """Chunked on-device edge-scatter aggregation == host scipy SpMM."""
    cfg = _mcfg(arch, aggregator=agg)
    init_fn, _ = get_model(cfg)
    params = init_fn(jax.random.PRNGKey(2), cfg)
    host = full_graph_logits(params, cfg, learn_ds.graph, learn_ds.features,
                             backend="host")
    dev = full_graph_logits(params, cfg, learn_ds.graph, learn_ds.features,
                            backend="device", edge_chunk=512)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)


def test_device_backend_evaluate(learn_ds):
    cfg = _mcfg("gcn")
    init_fn, _ = get_model(cfg)
    params = init_fn(jax.random.PRNGKey(3), cfg)
    a = evaluate(params, cfg, learn_ds.graph, learn_ds.features,
                 learn_ds.labels, learn_ds.test_mask, backend="device")
    b = evaluate(params, cfg, learn_ds.graph, learn_ds.features,
                 learn_ds.labels, learn_ds.test_mask, backend="host")
    assert a == pytest.approx(b, abs=0.02)


def test_lstm_full_aggregate_matches_unbucketed(learn_ds):
    """The degree-bucketed/chunked full-neighborhood LSTM equals one padded
    block over all vertices at max degree (VERDICT r1 #3: lstm inference)."""
    import jax.numpy as jnp
    from pagraph_tpu.models.inference import _lstm_full_aggregate
    from pagraph_tpu.ops.aggregate import (block_aggregate_lstm,
                                           init_lstm_params)
    from pagraph_tpu.sampling.block import Block

    g = learn_ds.graph
    D = 16
    h = learn_ds.features.astype(np.float32)
    p = init_lstm_params(jax.random.PRNGKey(5), D, D)
    got = _lstm_full_aggregate(g, h, p, row_budget=1 << 12)

    deg = np.diff(g.indptr)
    F = int(deg.max())
    cols = np.arange(F)[None, :]
    mask = cols < deg[:, None]
    flat = g.indptr[:-1][:, None] + np.minimum(cols, np.maximum(deg[:, None] - 1, 0))
    idx = g.indices[flat].astype(np.int32)
    blk = Block(neigh_pos=jnp.asarray(idx), neigh_mask=jnp.asarray(mask),
                self_pos=jnp.zeros(g.num_nodes, dtype=jnp.int32))
    want = np.asarray(block_aggregate_lstm(jnp.asarray(h), blk, p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lstm_end_to_end_train_and_eval(learn_ds):
    """Train a sage-lstm model and evaluate it full-graph — the round-1
    KeyError path (inference.py rejected aggregator='lstm')."""
    cfg = pg.Config(
        model=_mcfg("graphsage", aggregator="lstm"),
        sampler=pg.SamplerConfig(batch_size=128, fanout=2, num_hops=2,
                                 seed=3),
        train=pg.TrainConfig(lr=1e-2, eval_every=2),
    )
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(2)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0], losses
    assert tr.epoch_metrics[-1].val_acc is not None
    acc = evaluate(jax.device_get(tr.state.params), cfg.model, learn_ds.graph,
                   learn_ds.features, learn_ds.labels, learn_ds.test_mask)
    assert 0.0 <= acc <= 1.0


@pytest.mark.parametrize("arch", ["gcn", "graphsage", "gcn_cv"])
def test_preprocess_eval_works(learn_ds, arch):
    """Checkpoint-replay / online eval under preprocess configs — the
    reference treats preprocess as the flagship mode and its eval.py replays
    it (VERDICT r1 #4)."""
    mcfg = pg.ModelConfig(arch=arch, n_layers=2, hidden=12, feat_dim=16,
                          n_classes=5, preprocess=True)
    cfg = pg.Config(
        model=mcfg,
        sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                 num_hops=mcfg.num_sampled_hops, seed=3),
        train=pg.TrainConfig(lr=1e-2, eval_every=2),
    )
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(2)
    assert tr.epoch_metrics[-1].val_acc is not None
    params = jax.device_get(tr.state.params)
    host = full_graph_logits(params, cfg.model, learn_ds.graph,
                             learn_ds.features, backend="host")
    dev = full_graph_logits(params, cfg.model, learn_ds.graph,
                            learn_ds.features, backend="device",
                            edge_chunk=512)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)
    acc = evaluate(params, cfg.model, learn_ds.graph, learn_ds.features,
                   learn_ds.labels, learn_ds.test_mask)
    assert acc > 1.0 / 5  # beats chance after 2 epochs on a learnable task


def test_eval_backend_config_threads_through(learn_ds):
    """cfg.train.eval_backend='device' routes the online eval through the
    chunked-edge device backend; val-acc identical to the host backend."""
    accs = {}
    for be in ("host", "device"):
        mcfg = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=12,
                              feat_dim=16, n_classes=5)
        cfg = pg.Config(
            model=mcfg,
            sampler=pg.SamplerConfig(batch_size=128, fanout=2,
                                     num_hops=mcfg.num_sampled_hops, seed=3),
            train=pg.TrainConfig(lr=1e-2, eval_every=2, eval_backend=be),
        )
        tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
        tr.train(2)
        accs[be] = tr.epoch_metrics[-1].val_acc
    assert accs["host"] == pytest.approx(accs["device"], abs=1e-9), accs
    with pytest.raises(ValueError, match="eval_backend"):
        pg.Config(model=pg.ModelConfig(),
                  train=pg.TrainConfig(eval_backend="gpu")).validate()


@pytest.mark.parametrize("kind", ["sum", "max"])
def test_bucketed_aggregate_matches_scipy(learn_ds, kind):
    """_BucketedNeighborhoods (scatter-free device aggregation) == scipy,
    with f_cap tiny enough that the two-level hub path is exercised."""
    import jax.numpy as jnp
    import scipy.sparse as spsp

    from pagraph_tpu.models.inference import _BucketedNeighborhoods

    g = learn_ds.graph
    deg = np.diff(g.indptr)
    f_cap = 8
    assert (deg > f_cap).any(), "fixture must contain hub vertices"
    nbrs = _BucketedNeighborhoods(g, f_min=2, f_cap=f_cap,
                                  chunk_elems=1 << 12)
    h = learn_ds.features.astype(np.float32)
    got = np.asarray(nbrs.aggregate(jnp.asarray(h), kind))
    if kind == "sum":
        adj = spsp.csr_matrix(
            (np.ones(g.num_edges, np.float32), g.indices, g.indptr),
            shape=(g.num_nodes, g.num_nodes))
        want = adj @ h
    else:
        want = np.zeros_like(h, shape=(g.num_nodes, h.shape[1]))
        for v in range(g.num_nodes):
            nb = g.indices[g.indptr[v]:g.indptr[v + 1]]
            if len(nb):
                want[v] = h[nb].max(axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["sum", "max"])
def test_bucketed_hub_second_level_buckets(kind):
    """A mega-hub next to small hubs must not inflate every hub's
    second-level row to the global max window count (ADVICE r3): the
    level-2 reduction is bucketed per-hub.  Correctness pinned vs scipy
    on a graph engineered to produce >=2 distinct level-2 buckets."""
    import jax.numpy as jnp
    import scipy.sparse as spsp

    from pagraph_tpu.graph import CSRGraph
    from pagraph_tpu.models.inference import _BucketedNeighborhoods

    rng = np.random.default_rng(5)
    n = 300
    f_cap = 8
    # degrees: one mega-hub (25 windows -> F2 32), a few small hubs
    # (2-3 windows -> F2 2/4), the rest below f_cap (incl. zero-degree)
    deg = rng.integers(0, f_cap + 1, size=n)
    deg[0] = 200
    deg[1:4] = [17, 20, 24]
    src, dst = [], []
    for v in range(n):
        nb = rng.choice(n, size=deg[v], replace=False)
        src.extend(nb)
        dst.extend([v] * deg[v])
    coo = np.stack([np.array(dst), np.array(src)])
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr[1:], coo[0], 1)
    indptr = np.cumsum(indptr)
    order = np.argsort(coo[0], kind="stable")
    indices = coo[1][order].astype(np.int32)
    g = CSRGraph(indptr, indices,
                 np.bincount(indices, minlength=n).astype(np.int32))
    nbrs = _BucketedNeighborhoods(g, f_min=2, f_cap=f_cap,
                                  chunk_elems=1 << 12)
    assert nbrs._big is not None
    assert len(nbrs._big[2]) >= 2, "need multiple level-2 buckets"
    h = rng.standard_normal((n, 5)).astype(np.float32)
    got = np.asarray(nbrs.aggregate(jnp.asarray(h), kind))
    adj = spsp.csr_matrix(
        (np.ones(g.num_edges, np.float32), g.indices, g.indptr),
        shape=(n, n))
    if kind == "sum":
        want = adj @ h
    else:
        want = np.zeros((n, 5), np.float32)
        for v in range(n):
            nb = g.indices[g.indptr[v]:g.indptr[v + 1]]
            if len(nb):
                want[v] = h[nb].max(axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_eval_backend_auto_resolves(tiny_ds):
    """backend='auto': host below the edge threshold (identical logits),
    device above it (threshold monkey-patched down)."""
    import pagraph_tpu.models.inference as inf
    import pagraph_tpu as pg
    from pagraph_tpu.models import get_model

    cfg = pg.ModelConfig(arch="gcn", n_layers=1, hidden=8,
                         feat_dim=tiny_ds.features.shape[1], n_classes=5)
    init_fn, _ = get_model(cfg)
    import jax
    params = init_fn(jax.random.PRNGKey(0), cfg)
    ref = inf.full_graph_logits(params, cfg, tiny_ds.graph,
                                tiny_ds.features, backend="host")
    auto = inf.full_graph_logits(params, cfg, tiny_ds.graph,
                                 tiny_ds.features, backend="auto")
    np.testing.assert_allclose(auto, ref, rtol=1e-5, atol=1e-5)
    old = inf.AUTO_DEVICE_EDGES
    try:
        inf.AUTO_DEVICE_EDGES = 1    # force the device path
        dev = inf.full_graph_logits(params, cfg, tiny_ds.graph,
                                    tiny_ds.features, backend="auto")
    finally:
        inf.AUTO_DEVICE_EDGES = old
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)
