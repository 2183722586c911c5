"""GraphSAGE for neighbor-sampled minibatch training.

Functional re-design of the reference's ``GraphSageSampling``
(reference: PaGraph/model/graphsage_nssc.py:33-134):

  * per layer: ``fc_self(h_dst) + fc_neigh(agg(h_neighbors))`` with
    Xavier-uniform(relu-gain) weight init;
  * aggregators: ``mean`` | ``gcn`` (sum) | ``pool`` (max) | ``lstm``;
  * last hidden layer applies the width-doubling ``cat((h, act(h)))`` skip;
  * ``preprocess=True`` consumes a server-precomputed neighbor field at
    layer 0 and samples one hop less.

TPU-native simplification: the reference re-runs ``block_compute`` over every
remaining NodeFlow level per model layer (an O(L^2) blow-up,
graphsage_nssc.py:92-131) because DGL layers don't contain their successors.
Our minibatch IR guarantees layer i+1 is a prefix-subset of layer i, so the
destination's own representation is a ``self_pos`` gather and each model layer
costs exactly one block — same math at the seeds, strictly less compute.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.aggregate import block_aggregate, block_aggregate_lstm, block_self, init_lstm_params
from ..sampling.block import MiniBatch
from .common import concat_skip, dropout, init_linear, linear

ACT = jax.nn.relu
_RELU_GAIN = 1.4142135623730951  # sqrt(2), torch's calculate_gain('relu')

_AGG_KIND = {"mean": "mean", "gcn": "sum", "pool": "max"}


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    nl, hid, nc, fd = cfg.n_layers, cfg.hidden, cfg.n_classes, cfg.feat_dim
    n_updates = nl + (0 if cfg.preprocess else 1)
    keys = jax.random.split(key, 2 * (nl + 2) + 4)
    ki = iter(range(len(keys)))
    params: dict = {"updates": [], "lstm": []}

    def upd(in_dim, out_dim):
        return {
            "self": init_linear(keys[next(ki)], in_dim, out_dim,
                                xavier_gain=_RELU_GAIN, dtype=dtype),
            "neigh": init_linear(keys[next(ki)], in_dim, out_dim,
                                 xavier_gain=_RELU_GAIN, dtype=dtype),
        }

    dims = []  # input dim of each update (block) in reference order
    if cfg.preprocess:
        params["pre"] = upd(fd, hid)
        dims.extend([hid] * (nl - 1))
    else:
        dims.append(fd)
        dims.extend([hid] * (nl - 1))
    # output layer consumes concat-widened reps unless skip is disabled
    dims.append(2 * hid if cfg.skip_connection else hid)

    out_dims = [hid] * (len(dims) - 1) + [nc]
    for d_in, d_out in zip(dims, out_dims):
        params["updates"].append(upd(d_in, d_out))
        if cfg.aggregator == "lstm":
            params["lstm"].append(init_lstm_params(keys[next(ki)], d_in, d_in, dtype))
    return params


def apply(
    params: dict,
    cfg: ModelConfig,
    mb: MiniBatch,
    feats: jax.Array,
    *,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    neigh_feats: Optional[jax.Array] = None,  # preprocess: pre-agg layer-0 field
) -> jax.Array:
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
        if neigh_feats is None:
            raise ValueError("preprocess mode requires neigh_feats")
        h = dropout(h, cfg.dropout, next_rng(), train)
        h = linear(params["pre"]["self"], h) + linear(params["pre"]["neigh"], neigh_feats)
        h = (concat_skip(h, ACT) if (nl == 1 and cfg.skip_connection)
             else ACT(h))

    for bi, (block, p) in enumerate(zip(mb.blocks, updates)):
        h = dropout(h, cfg.dropout, next_rng(), train)
        if cfg.aggregator == "lstm":
            h_neigh = block_aggregate_lstm(h, block, params["lstm"][bi])
        else:
            h_neigh = block_aggregate(h, block, _AGG_KIND[cfg.aggregator])
        h_self = block_self(h, block)
        out = linear(p["self"], h_self) + linear(p["neigh"], h_neigh)
        upd_global_idx = bi + (1 if cfg.preprocess else 0)
        if upd_global_idx == nl - 1 and cfg.skip_connection:
            h = concat_skip(out, ACT)
        elif upd_global_idx == nl:
            h = out                       # output layer: raw logits
        else:
            h = ACT(out)
    return h
