"""Control-variate GCN: zero-history equivalence + training."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pagraph_tpu as pg
from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.models import gcn_cv
from pagraph_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def learn_ds():
    return synthetic_dataset(num_nodes=500, num_edges=4000, feat_dim=16,
                             num_classes=5, seed=21, learnable=True)


def _cfg(nl=1):
    m = pg.ModelConfig(arch="gcn_cv", n_layers=nl, hidden=12, feat_dim=16,
                       n_classes=5, preprocess=True, dropout=0.0)
    return pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=64, fanout=2,
                                 num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(lr=1e-2),
    )


def test_requires_preprocess():
    with pytest.raises(ValueError, match="preprocess"):
        pg.Config(model=pg.ModelConfig(arch="gcn_cv", preprocess=False),
                  sampler=pg.SamplerConfig(num_hops=1))


@pytest.mark.parametrize("nl", [1, 2])
def test_zero_history_matches_plain_mean_agg(learn_ds, nl):
    """With zero history and zero agg-history, cv-GCN == plain preprocess-GCN
    with mean aggregation of raw activations (the control variate vanishes)."""
    cfg = _cfg(nl)
    init_fn, _ = pg.models.get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg.model)

    from pagraph_tpu.sampling.sampler import NeighborSampler
    s = NeighborSampler(learn_ds.graph, learn_ds.train_nids, cfg.sampler,
                        labels=learn_ds.labels, backend="numpy")
    mb = s.sample(learn_ds.train_nids[:64])
    mb = jax.tree.map(jnp.asarray, mb)
    feats = jnp.asarray(learn_ds.features[np.asarray(mb.layer_nids[0])])

    widths = gcn_cv.layer_widths(cfg.model)
    h_hist = [jnp.zeros((mb.layer_nids[b].shape[0], widths[b]))
              for b in range(nl)]
    agg_hist = [jnp.zeros((mb.layer_nids[b + 1].shape[0], widths[b]))
                for b in range(nl)]
    logits, new_hists = gcn_cv.apply(
        params, cfg.model, mb, feats, train=False,
        h_hist=h_hist, agg_hist=agg_hist,
    )
    # manual plain forward with the same params (mean agg of activations)
    from pagraph_tpu.models.common import linear, concat_skip
    from pagraph_tpu.ops.aggregate import block_aggregate
    h = linear(params["dense"], feats)
    h = concat_skip(h, jax.nn.relu) if nl == 1 else jax.nn.relu(h)
    for b, p in enumerate(params["updates"]):
        h = block_aggregate(h, mb.blocks[b], "mean")
        h = linear(p, h)
        if b + 1 == nl - 1:
            h = concat_skip(h, jax.nn.relu)
        elif b + 1 < nl:
            h = jax.nn.relu(h)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(h),
                               rtol=1e-5, atol=1e-5)
    assert len(new_hists) == nl
    assert new_hists[0].shape == (mb.layer_nids[0].shape[0], widths[0])


def test_cv_training_reduces_loss(learn_ds):
    cfg = _cfg(nl=1)
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses


def test_cv_history_scatter_roundtrip(learn_ds):
    cfg = _cfg(nl=2)
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(1)
    # histories must have been written for trained vertices
    assert np.abs(tr.cv_history.hist[0]).sum() > 0
    assert np.abs(tr.cv_history.agg[0]).sum() > 0


@pytest.mark.parametrize("on_device", [False, True])
def test_cv_bf16_compute(learn_ds, on_device):
    """Mixed-precision cv-GCN: bf16 fwd/bwd + histories, f32 state."""
    cfg = _cfg(1)
    cfg.train.dtype = "bfloat16"
    cfg.train.on_device_sampling = on_device
    from pagraph_tpu.train.loop import Trainer
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_dp_on_device_cv_trains(learn_ds):
    """Multi-chip control-variate GCN: per-partition device-resident
    histories, pmean'd grads, deterministic."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    def build():
        cfg = _cfg()
        cfg.partition = pg.PartitionConfig(
            num_parts=4, num_hops=cfg.model.num_sampled_hops)
        cfg.train.on_device_sampling = True
        return DataParallelTrainer.from_dataset(
            cfg, learn_ds, mesh=make_mesh(4), seed=5)

    tr = build()
    tr.train(4)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    tr2 = build()
    tr2.train(4)
    np.testing.assert_allclose(
        losses, [m.mean_loss for m in tr2.epoch_metrics], rtol=1e-6)


def test_dp_cv_host_pipeline_raises(learn_ds):
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    cfg = _cfg()
    cfg.partition = pg.PartitionConfig(
        num_parts=4, num_hops=cfg.model.num_sampled_hops)
    with pytest.raises(NotImplementedError, match="on_device_sampling"):
        DataParallelTrainer.from_dataset(cfg, learn_ds, mesh=make_mesh(4))


def test_cv_resume_restores_histories(tmp_path, learn_ds):
    """Host-mode gcn_cv resume: the CV hist/agg arrays come back from the
    checkpoint's .aux sidecar bit-identical (VERDICT r2 #6)."""
    ckpt_dir = str(tmp_path / "cv_ck")
    cfg = _cfg(nl=1)
    cfg.train.ckpt_dir, cfg.train.ckpt_every = ckpt_dir, 1
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(2)
    want_hist = [h.copy() for h in tr.cv_history.hist]
    want_agg = [a.copy() for a in tr.cv_history.agg]
    assert np.abs(want_hist[0]).sum() > 0          # non-trivial state

    tr2 = Trainer.from_dataset(cfg, learn_ds, seed=0)
    start = tr2.resume()
    assert start == 2
    for got, want in zip(tr2.cv_history.hist, want_hist):
        np.testing.assert_array_equal(got, want)
    for got, want in zip(tr2.cv_history.agg, want_agg):
        np.testing.assert_array_equal(got, want)
    tr2.train(3, start_epoch=start)
    assert np.isfinite(tr2.epoch_metrics[-1].mean_loss)


def test_cv_resume_device_trajectory(tmp_path, learn_ds):
    """On-device gcn_cv: a run resumed from epoch 1's checkpoint reproduces
    the uninterrupted trajectory exactly (epoch keys fold by absolute epoch;
    histories ride the .aux sidecar)."""
    def build(ckpt_dir=None):
        cfg = _cfg(nl=1)
        cfg.train.on_device_sampling = True
        if ckpt_dir:
            cfg.train.ckpt_dir, cfg.train.ckpt_every = ckpt_dir, 1
        return Trainer.from_dataset(cfg, learn_ds, seed=0)

    full = build(str(tmp_path / "full"))
    full.train(4)
    full_losses = [m.mean_loss for m in full.epoch_metrics]

    ck = str(tmp_path / "part")
    tr = build(ck)
    tr.train(2)
    tr2 = build(ck)
    start = tr2.resume()
    assert start == 2
    tr2.train(4, start_epoch=start)
    resumed = [m.mean_loss for m in tr2.epoch_metrics]
    np.testing.assert_allclose(resumed, full_losses[2:], rtol=1e-5)


def test_cv_resume_missing_aux_warns(tmp_path, learn_ds):
    """A pre-aux checkpoint (no .aux sidecar) must warn loudly and resume
    with zero histories instead of failing."""
    import shutil

    ckpt_dir = str(tmp_path / "old_ck")
    cfg = _cfg(nl=1)
    cfg.train.ckpt_dir, cfg.train.ckpt_every = ckpt_dir, 1
    tr = Trainer.from_dataset(cfg, learn_ds, seed=0)
    tr.train(1)
    import os
    aux = [p for p in os.listdir(ckpt_dir) if p.endswith(".aux")]
    assert aux, "aux sidecar was not written"
    for p in aux:
        shutil.rmtree(os.path.join(ckpt_dir, p))
    tr2 = Trainer.from_dataset(cfg, learn_ds, seed=0)
    with pytest.warns(RuntimeWarning, match="no .*aux CV histories"):
        start = tr2.resume()
    assert start == 1
    assert np.abs(tr2.cv_history.hist[0]).sum() == 0


def test_dp_cv_resume_trajectory(tmp_path, learn_ds):
    """Multi-chip on-device gcn_cv resume reproduces the uninterrupted
    trajectory (per-partition hist/agg stacks ride the .aux sidecar)."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    def build(ckpt_dir=None):
        cfg = _cfg()
        cfg.partition = pg.PartitionConfig(
            num_parts=4, num_hops=cfg.model.num_sampled_hops)
        cfg.train.on_device_sampling = True
        if ckpt_dir:
            cfg.train.ckpt_dir, cfg.train.ckpt_every = ckpt_dir, 1
        return DataParallelTrainer.from_dataset(
            cfg, learn_ds, mesh=make_mesh(4), seed=5)

    full = build(str(tmp_path / "dpfull"))
    full.train(4)
    full_losses = [m.mean_loss for m in full.epoch_metrics]

    ck = str(tmp_path / "dppart")
    tr = build(ck)
    tr.train(2)
    tr2 = build(ck)
    start = tr2.resume()
    assert start == 2
    tr2.train(4, start_epoch=start)
    resumed = [m.mean_loss for m in tr2.epoch_metrics]
    np.testing.assert_allclose(resumed, full_losses[2:], rtol=1e-5)


def test_edge_mode_cv_matches_cache(learn_ds):
    """gcn_cv x edge-partitioned mode (VERDICT r2 #8): same partitions and
    seeds as the dp-cache cv mode -> identical minibatches and history
    updates; the halo exchange must deliver the same pre-aggregated rows
    the per-chip full cache would have. Trajectories must match."""
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    runs = {}
    for src in ("cache", "edge"):
        cfg = _cfg()
        cfg.partition = pg.PartitionConfig(
            num_parts=4, num_hops=cfg.model.num_sampled_hops)
        cfg.train.on_device_sampling = True
        tr = DataParallelTrainer.from_dataset(
            cfg, learn_ds, mesh=make_mesh(4), seed=5, feature_source=src)
        tr.train(4)
        runs[src] = [m.mean_loss for m in tr.epoch_metrics]
        if src == "edge":
            assert tr.halo_drops == 0
            D = 4
            assert tr._feat_shards.shape[0] == D
    np.testing.assert_allclose(runs["cache"], runs["edge"], rtol=1e-4)
    assert runs["edge"][-1] < runs["edge"][0] * 0.9, runs


def test_cv_ici_mode_still_raises(learn_ds):
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    cfg = _cfg()
    cfg.train.on_device_sampling = True
    with pytest.raises(NotImplementedError, match="divergent histories"):
        DataParallelTrainer.from_dataset(
            cfg, learn_ds, mesh=make_mesh(4), seed=0, feature_source="ici")


def test_aux_shard_manifest_ignores_stale(tmp_path, learn_ds):
    """Shard files from a different process layout next to the checkpoint
    are ignored (with a warning), not last-wins merged (ADVICE r4 #1)."""
    import os
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    from pagraph_tpu.train.checkpoint import open_aux_shards, save_aux_shards

    ck = str(tmp_path / "stale_ck")
    cfg = _cfg()
    cfg.partition = pg.PartitionConfig(
        num_parts=4, num_hops=cfg.model.num_sampled_hops)
    cfg.train.on_device_sampling = True
    cfg.train.ckpt_dir, cfg.train.ckpt_every = ck, 1
    tr = DataParallelTrainer.from_dataset(cfg, learn_ds,
                                          mesh=make_mesh(4), seed=5)
    tr.train(1)
    save_aux_shards(ck, cfg.model.arch, 0,
                    {"hist": list(tr._dev_hists), "agg": list(tr._dev_aggs)})
    # plant a stale shard claiming a 4-process layout with poisoned rows
    poisoned = {"__nproc__": np.int64(4), "__pidx__": np.int64(1),
                "hist0_row0": np.full_like(np.asarray(tr._dev_hists[0][0]),
                                           1e9)}
    np.savez(os.path.join(ck, f"{cfg.model.arch}_0.aux.p1.npz"), **poisoned)
    with pytest.warns(RuntimeWarning, match="stale CV aux shard"):
        get_row = open_aux_shards(ck, cfg.model.arch, 0)
    assert get_row is not None
    row = get_row("hist0_row0")
    np.testing.assert_array_equal(row, np.asarray(tr._dev_hists[0][0]))
    tr.close()


def test_cv_resume_cross_layout_shards(tmp_path, learn_ds):
    """A checkpoint whose CV aux exists ONLY as shard files (multi-process
    writer) restores under a single-process launch instead of silently
    zeroing the histories (ADVICE r4 #2)."""
    import shutil, os
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    from pagraph_tpu.train.checkpoint import save_aux_shards

    def build(ckpt_dir):
        cfg = _cfg()
        cfg.partition = pg.PartitionConfig(
            num_parts=4, num_hops=cfg.model.num_sampled_hops)
        cfg.train.on_device_sampling = True
        cfg.train.ckpt_dir, cfg.train.ckpt_every = ckpt_dir, 1
        return DataParallelTrainer.from_dataset(
            cfg, learn_ds, mesh=make_mesh(4), seed=5)

    full = build(str(tmp_path / "xfull"))
    full.train(4)
    full_losses = [m.mean_loss for m in full.epoch_metrics]

    ck = str(tmp_path / "xpart")
    tr = build(ck)
    tr.train(2)
    # convert the written layout: drop the orbax .aux sidecars, keep only
    # shard files (what a multi-process writer leaves)
    for e in (0, 1):
        save_aux_shards(ck, tr.cfg.model.arch, e,
                        {"hist": list(tr._dev_hists),
                         "agg": list(tr._dev_aggs)})
        aux_dir = os.path.join(ck, f"{tr.cfg.model.arch}_{e}.aux")
        if os.path.isdir(aux_dir):
            shutil.rmtree(aux_dir)
    tr2 = build(ck)
    start = tr2.resume()
    assert start == 2
    tr2.train(4, start_epoch=start)
    resumed = [m.mean_loss for m in tr2.epoch_metrics]
    np.testing.assert_allclose(resumed, full_losses[2:], rtol=1e-5)
    full.close(); tr.close(); tr2.close()
