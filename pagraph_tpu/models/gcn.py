"""GCN for neighbor-sampled minibatch training.

Functional re-design of the reference's ``GCNSampling`` / ``GCNInfer``
(reference: PaGraph/model/gcn_nssc.py:27-164):

  * training aggregates sampled in-neighbors with **mean**; inference
    aggregates with **sum** and scales by the destination's precomputed
    ``norm`` (= 1/in_degree) — exactly the reference split;
  * the last *hidden* layer applies the width-doubling skip
    ``cat((h, act(h)))``; the output layer consumes ``2*hidden``;
  * ``preprocess=True`` consumes server-side pre-aggregated layer-0 features
    through a dense linear and samples one hop less
    (reference: gcn_nssc.py:80-100, server/pa_server.py:45-52).

Total GNN depth is ``n_layers + 1`` blocks without preprocess, ``n_layers``
with — matching the sampler's ``num_sampled_hops``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.aggregate import block_aggregate
from ..sampling.block import MiniBatch
from .common import concat_skip, dropout, init_linear, linear

ACT = jax.nn.relu


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    nl, hid, nc, fd = cfg.n_layers, cfg.hidden, cfg.n_classes, cfg.feat_dim
    keys = jax.random.split(key, nl + 2)
    params: dict = {"updates": []}
    if cfg.preprocess:
        params["dense"] = init_linear(keys[0], fd, hid, dtype=dtype)
        first_hidden = 1
    else:
        params["updates"].append(init_linear(keys[0], fd, hid, dtype=dtype))
        first_hidden = 1
    for i in range(first_hidden, nl):
        params["updates"].append(init_linear(keys[i], hid, hid, dtype=dtype))
    # skip-concat doubles the output layer's input (gcn_nssc.py:58); the
    # plain gcn_ns variant has no skip (gcn_ns.py:23-44)
    out_in = 2 * hid if cfg.skip_connection else hid
    params["updates"].append(init_linear(keys[nl], out_in, nc, dtype=dtype))
    return params


def _node_update(p: dict, h_agg: jax.Array, *, is_concat: bool,
                 is_output: bool, norm_dst: Optional[jax.Array]) -> jax.Array:
    if norm_dst is not None:                  # inference: sum * norm = sym mean
        h_agg = h_agg * norm_dst[:, None]
    h = linear(p, h_agg)
    if is_concat:
        return concat_skip(h, ACT)
    if not is_output:
        return ACT(h)
    return h


def apply(
    params: dict,
    cfg: ModelConfig,
    mb: MiniBatch,
    feats: jax.Array,                    # [cap_0, feat_dim] layer-0 features
    *,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    norm_layers: Optional[tuple] = None, # per-layer [cap_i] norms (inference)
) -> jax.Array:
    """Forward pass -> logits [cap_seed, n_classes]."""
    infer = norm_layers is not None
    agg_kind = "sum" if infer else "mean"
    nl = cfg.n_layers
    updates = params["updates"]
    assert len(mb.blocks) == len(updates), (
        f"minibatch has {len(mb.blocks)} blocks but model expects {len(updates)}"
    )

    def next_rng():
        nonlocal dropout_rng
        if dropout_rng is None:
            return None
        dropout_rng, sub = jax.random.split(dropout_rng)
        return sub

    h = feats
    if cfg.preprocess:
        # Layer-0 aggregation was done once over the full graph server-side;
        # apply the dense input transform here (gcn_nssc.py:80-91).
        h = dropout(h, cfg.dropout, next_rng(), train)
        h = linear(params["dense"], h)
        h = (concat_skip(h, ACT) if (nl == 1 and cfg.skip_connection)
             else ACT(h))

    for bi, (block, p) in enumerate(zip(mb.blocks, updates)):
        if not infer:
            h = dropout(h, cfg.dropout, next_rng(), train)
        # concat fires on the last hidden update; with preprocess the dense
        # input layer already consumed update slot 0 of the reference order.
        upd_global_idx = bi + (1 if cfg.preprocess else 0)
        is_concat = (upd_global_idx == nl - 1) and cfg.skip_connection
        is_output = upd_global_idx == nl
        h_agg = block_aggregate(h, block, agg_kind)
        norm_dst = norm_layers[bi + 1] if infer else None
        h = _node_update(p, h_agg, is_concat=is_concat,
                         is_output=is_output, norm_dst=norm_dst)
    return h
