"""Cross-framework parity: our jitted block forward == an independent torch
implementation of the reference models' math.

The reference is DGL+torch (PaGraph/model/gcn_nssc.py, graphsage_nssc.py);
re-implementing its per-block computation in torch (mask-aware mean over
sampled in-neighbors, NodeUpdate linear + skip-concat, fc_self+fc_neigh for
SAGE) and running it on the same MiniBatch with the same weights checks our
semantics against the reference's host framework, not just against our own
numpy reference.
"""
import numpy as np
import jax
import pytest
import torch

import pagraph_tpu as pg
from pagraph_tpu.models import get_model
from pagraph_tpu.sampling.sampler import NeighborSampler


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def _torch_block_mean(h, block):
    """Mask-aware mean over sampled neighbors (reference fn.mean over the
    block's incoming message set)."""
    nbr = h[_t(block.neigh_pos).long()]                 # [cap_dst, fanout, D]
    mask = _t(block.neigh_mask).unsqueeze(-1).float()
    s = (nbr * mask).sum(dim=1)
    cnt = mask.sum(dim=1).clamp(min=1.0)
    return s / cnt


def _torch_linear(p, x):
    return x @ _t(p["w"]).float() + _t(p["b"]).float()


@pytest.fixture(scope="module")
def setup(tiny_ds):
    cfgs = pg.SamplerConfig(batch_size=32, fanout=3, num_hops=2, seed=1)
    sampler = NeighborSampler(tiny_ds.graph, tiny_ds.train_nids, cfgs,
                              labels=tiny_ds.labels, backend="numpy")
    mb = sampler.sample(tiny_ds.train_nids[:32])
    feats = tiny_ds.features[np.asarray(mb.input_nids)]
    return mb, feats


def test_gcn_matches_torch(setup):
    mb, feats = setup
    cfg = pg.ModelConfig(arch="gcn", n_layers=1, hidden=8, feat_dim=16,
                         n_classes=5)
    init_fn, apply_fn = get_model(cfg)
    params = init_fn(jax.random.PRNGKey(3), cfg)
    ours = np.asarray(apply_fn(params, cfg, jax.tree.map(np.asarray, mb),
                               feats, train=False))

    # torch re-implementation of GCNSampling (gcn_nssc.py:60-77): per block
    # mean-aggregate then NodeUpdate; skip-concat on the last hidden layer
    h = _t(feats).float()
    for li, p in enumerate(params["updates"]):
        h_agg = _torch_block_mean(h, mb.blocks[li])
        h = _torch_linear(p, h_agg)
        if li == cfg.n_layers - 1:          # skip-concat (NodeUpdate concat=True)
            h = torch.cat([h, torch.relu(h)], dim=1)
        elif li < cfg.n_layers:
            h = torch.relu(h)
    np.testing.assert_allclose(ours, h.numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("agg", ["mean", "gcn", "pool"])
def test_sage_matches_torch(setup, agg):
    mb, feats = setup
    cfg = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=8, feat_dim=16,
                         n_classes=5, aggregator=agg)
    init_fn, apply_fn = get_model(cfg)
    params = init_fn(jax.random.PRNGKey(4), cfg)
    ours = np.asarray(apply_fn(params, cfg, jax.tree.map(np.asarray, mb),
                               feats, train=False))

    # torch re-implementation of GraphSageSampling's per-layer math
    # (graphsage_nssc.py NodeUpdate: fc_self(h) + fc_neigh(h_neigh))
    h = _t(feats).float()
    for li, p in enumerate(params["updates"]):
        block = mb.blocks[li]
        nbr = h[_t(block.neigh_pos).long()]
        mask = _t(block.neigh_mask).unsqueeze(-1).float()
        if agg == "mean":
            h_neigh = (nbr * mask).sum(1) / mask.sum(1).clamp(min=1.0)
        elif agg == "gcn":
            h_neigh = (nbr * mask).sum(1)
        else:  # pool/max
            neg = torch.where(mask.bool(), nbr,
                              torch.tensor(-torch.inf))
            h_neigh = neg.max(dim=1).values
            h_neigh = torch.where(torch.isinf(h_neigh),
                                  torch.zeros_like(h_neigh), h_neigh)
        h_self = h[_t(block.self_pos).long()]
        out = _torch_linear(p["self"], h_self) + _torch_linear(p["neigh"], h_neigh)
        if li == cfg.n_layers - 1:
            h = torch.cat([out, torch.relu(out)], dim=1)
        elif li < cfg.n_layers:
            h = torch.relu(out)
        else:
            h = out
    np.testing.assert_allclose(ours, h.numpy(), rtol=2e-4, atol=2e-4)
