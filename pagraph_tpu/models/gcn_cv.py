"""Control-variate (VR-GCN style) GCN.

Functional re-design of the reference's ``gcn_cvsc.GCNSampling``
(reference: PaGraph/model/gcn_cvsc.py:42-96): per layer, aggregate the
*delta* between current activations and a per-vertex history, then add the
(periodically refreshed) full-graph aggregation of that history — an
unbiased, low-variance estimate with small fan-outs.

Where the reference stashes mutable history tensors inside NodeFlow frames
(ephemeral — they never propagate back to its store, gcn_cvsc.py:94), here
history is explicit functional state: the trainer gathers per-layer history
slices for the batch, the model returns the fresh activations, and
:class:`CVHistory` scatters them back into host arrays and refreshes the
aggregated histories with an exact full-graph SpMM.

Input contract matches the reference: layer-0 consumes *pre-aggregated*
features ('preprocess' field) through a dense linear, so the sampler runs
``n_layers`` hops (model must be configured with ``preprocess=True``).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.aggregate import block_aggregate
from ..sampling.block import MiniBatch
from .common import concat_skip, dropout, init_linear, linear

ACT = jax.nn.relu


def layer_widths(cfg: ModelConfig) -> List[int]:
    """Activation width entering each block b = 0..n_layers-1."""
    nl, h = cfg.n_layers, cfg.hidden
    return [(2 * h if (i == nl - 1) else h) for i in range(nl)]


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    if not cfg.preprocess:
        raise ValueError("gcn_cv requires preprocess=True (reference contract)")
    nl, hid, nc, fd = cfg.n_layers, cfg.hidden, cfg.n_classes, cfg.feat_dim
    keys = jax.random.split(key, nl + 1)
    params: dict = {"dense": init_linear(keys[0], fd, hid, dtype=dtype),
                    "updates": []}
    for i in range(1, nl):
        params["updates"].append(init_linear(keys[i], hid, hid, dtype=dtype))
    params["updates"].append(init_linear(keys[nl], 2 * hid, nc, dtype=dtype))
    return params


def apply(
    params: dict,
    cfg: ModelConfig,
    mb: MiniBatch,
    feats: jax.Array,                      # [cap_0, feat_dim] PRE-AGGREGATED
    *,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    h_hist: Sequence[jax.Array] = (),      # [cap_b, w_b] history at src layer b
    agg_hist: Sequence[jax.Array] = (),    # [cap_{b+1}, w_b] agg history at dst
) -> Tuple[jax.Array, List[jax.Array]]:
    """Returns (logits, new_histories) — new_histories[b] is the fresh
    activation at layer b (stop-gradient), to be scattered into the host
    history store."""
    nl = cfg.n_layers
    updates = params["updates"]
    assert len(mb.blocks) == len(updates) == nl

    def next_rng():
        nonlocal dropout_rng
        if dropout_rng is None:
            return None
        dropout_rng, sub = jax.random.split(dropout_rng)
        return sub

    h = dropout(feats, cfg.dropout, next_rng(), train)
    h = linear(params["dense"], h)
    h = concat_skip(h, ACT) if nl == 1 else ACT(h)

    new_hists: List[jax.Array] = []
    for b, (block, p) in enumerate(zip(mb.blocks, updates)):
        new_hists.append(jax.lax.stop_gradient(h))
        delta = h - h_hist[b]
        h_agg = block_aggregate(delta, block, "mean")
        h_agg = h_agg + agg_hist[b]
        h_agg = dropout(h_agg, cfg.dropout, next_rng(), train)
        h = linear(p, h_agg)
        upd_id = b + 1                      # reference layer_id
        if upd_id == nl - 1:
            h = concat_skip(h, ACT)
        elif upd_id < nl:
            h = ACT(h)
    return h, new_hists


class CVHistory:
    """Host-side per-layer history store + exact aggregated histories.

    ``hist[b]``: [N, w_b] activations last seen at layer b;
    ``agg[b]``:  [N, w_b] full-graph mean aggregation of hist[b], refreshed
    explicitly (e.g. once per epoch) — the reference leaves this to its
    store's one-time preprocess and never refreshes (SURVEY.md notes the cv
    model is demonstration-grade there)."""

    def __init__(self, cfg: ModelConfig, graph, num_nodes: int):
        self.cfg = cfg
        self.graph = graph
        self.widths = layer_widths(cfg)
        self.hist = [np.zeros((num_nodes, w), dtype=np.float32)
                     for w in self.widths]
        self.agg = [np.zeros((num_nodes, w), dtype=np.float32)
                    for w in self.widths]

    def gather(self, mb: MiniBatch):
        """Per-batch history slices for apply()."""
        h_hist = [
            jnp.asarray(self.hist[b][np.asarray(mb.layer_nids[b])])
            for b in range(len(self.hist))
        ]
        agg_hist = [
            jnp.asarray(self.agg[b][np.asarray(mb.layer_nids[b + 1])])
            for b in range(len(self.agg))
        ]
        return h_hist, agg_hist

    def scatter(self, mb: MiniBatch, new_hists: Sequence[jax.Array]) -> None:
        for b, nh in enumerate(new_hists):
            ids = np.asarray(mb.layer_nids[b])
            mask = np.asarray(mb.layer_mask[b])
            self.hist[b][ids[mask]] = np.asarray(nh)[mask]

    def refresh_agg(self) -> None:
        from ..storage.feature_store import full_graph_mean_aggregate

        for b in range(len(self.hist)):
            self.agg[b] = full_graph_mean_aggregate(self.graph, self.hist[b])
