"""Graph Isomorphism Network on the padded-block IR (beyond-reference).

The reference ships GCN/GraphSAGE/CV-GCN only; GIN (Xu et al., ICLR'19)
completes the standard message-passing families and is a pure MXU workload
on this IR: the injective update

    h_v' = MLP((1 + eps) * h_v + sum_{u in N(v)} h_u)

is one masked fanout-axis sum (``block_aggregate(..., 'sum')``), one axpy,
and a two-layer MLP — no softmax, no per-edge weights.  ``eps`` is learnable
per layer (init 0, the GIN-eps variant).  Sum aggregation is used at both
training and inference time (injectivity is the model's point); training
sums over the sampled fanout, full-graph inference over the complete
in-neighborhood — the same sampled-vs-exact split the reference applies to
GCN (reference: PaGraph/model/gcn_nssc.py:60-77 vs :130-164).

Layer conventions match the rest of the zoo: ``n_layers`` hidden updates of
width ``hidden``, width-doubling ``cat((h, act(h)))`` skip on the last
hidden update when ``skip_connection`` is set, raw logits from the output
update.  ``preprocess`` is rejected: the host store's pre-aggregation field
is a mean without the ``(1+eps)`` self term, which would change the model.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.aggregate import block_aggregate, block_self
from ..sampling.block import MiniBatch
from .common import concat_skip, dropout, init_linear, linear

ACT = jax.nn.relu


def _init_update(key: jax.Array, in_dim: int, hid: int, out_dim: int,
                 dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "eps": jnp.zeros((), dtype),
        "w1": init_linear(k1, in_dim, hid, dtype=dtype),
        "w2": init_linear(k2, hid, out_dim, dtype=dtype),
    }


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    nl, hid, nc, fd = cfg.n_layers, cfg.hidden, cfg.n_classes, cfg.feat_dim
    keys = jax.random.split(key, nl + 1)
    # dims[i] = input width of update i; hidden updates emit `hid`, the
    # output update emits `nc`.  The skip concat doubles the output
    # update's input.
    dims = [fd] + [hid] * (nl - 1)
    if nl >= 1:
        dims.append(2 * hid if cfg.skip_connection else hid)
    out_dims = [hid] * nl + [nc]
    updates = []
    for i, (d_in, d_out) in enumerate(zip(dims, out_dims)):
        updates.append(_init_update(keys[i], d_in, hid, d_out, dtype=dtype))
    return {"updates": updates}


def _gin_update(p: dict, h_self: jax.Array, h_sum: jax.Array) -> jax.Array:
    pre = (1.0 + p["eps"]) * h_self + h_sum
    return linear(p["w2"], ACT(linear(p["w1"], pre)))


def apply(
    params: dict,
    cfg: ModelConfig,
    mb: MiniBatch,
    feats: jax.Array,                    # [cap_0, feat_dim]
    *,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    neigh_feats: Optional[jax.Array] = None,   # unsupported (validated away)
) -> jax.Array:
    """Forward pass -> logits [cap_seed, n_classes]."""
    del neigh_feats
    nl = cfg.n_layers
    updates = params["updates"]
    assert len(mb.blocks) == len(updates), (
        f"minibatch has {len(mb.blocks)} blocks but model expects "
        f"{len(updates)}"
    )

    def next_rng():
        nonlocal dropout_rng
        if dropout_rng is None:
            return None
        dropout_rng, sub = jax.random.split(dropout_rng)
        return sub

    h = feats
    for bi, (block, p) in enumerate(zip(mb.blocks, updates)):
        h = dropout(h, cfg.dropout, next_rng(), train)
        h_sum = block_aggregate(h, block, "sum")
        h_self = block_self(h, block)
        out = _gin_update(p, h_self, h_sum)
        if bi == nl - 1 and cfg.skip_connection:
            h = concat_skip(out, ACT)
        elif bi == nl:
            h = out                       # output update: raw logits
        else:
            h = ACT(out)
    return h
