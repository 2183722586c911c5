"""Graph Attention Network on the padded-block IR (beyond-reference).

The reference ships GCN/GraphSAGE/CV-GCN only; GAT is the natural next
family and maps well onto TPU: per-edge attention on fixed-shape blocks is
a masked softmax over the fanout axis — dense [cap_dst, fanout+1, heads]
tensors the VPU tiles directly, with all projections as MXU matmuls.  The
formulation follows Velickovic et al. (ICLR'18):

    e_ij    = LeakyReLU(a_self . z_i + a_neigh . z_j)
    alpha_i = softmax over j in N(i) + {i}   (masked; padded slots excluded)
    h_i'    = sum_j alpha_ij z_j             (self-loop edge included)

Hidden layers concatenate ``num_heads`` heads (ELU); the output layer
averages heads into logits.  ``preprocess`` is rejected: attention needs
raw per-neighbor features, not a server-side pre-aggregation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.aggregate import _neigh_msgs, block_self
from ..sampling.block import MiniBatch
from .common import dropout

_NEG = -1e30


def _init_layer(key: jax.Array, in_dim: int, heads: int, head_dim: int,
                dtype=jnp.float32) -> dict:
    kw, ks, kn = jax.random.split(key, 3)
    bound = jnp.sqrt(6.0 / (in_dim + heads * head_dim))
    ab = jnp.sqrt(6.0 / (head_dim + 1))
    return {
        "w": jax.random.uniform(kw, (in_dim, heads * head_dim), dtype,
                                -bound, bound),
        "a_self": jax.random.uniform(ks, (heads, head_dim), dtype, -ab, ab),
        "a_neigh": jax.random.uniform(kn, (heads, head_dim), dtype, -ab, ab),
    }


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    nl, hid, nc, fd = cfg.n_layers, cfg.hidden, cfg.n_classes, cfg.feat_dim
    heads = cfg.num_heads
    keys = jax.random.split(key, nl + 1)
    layers, in_dim = [], fd
    for i in range(nl):
        layers.append(_init_layer(keys[i], in_dim, heads, hid, dtype=dtype))
        in_dim = heads * hid
    # output layer: heads averaged into n_classes logits
    layers.append(_init_layer(keys[nl], in_dim, heads, nc, dtype=dtype))
    return {"layers": layers}


def _gat_block(p: dict, h_src: jax.Array, block, heads: int) -> jax.Array:
    """One attention block: [cap_src, in] -> [cap_dst, heads, head_dim].

    The self-loop edge is kept OUT of the padded [cap_dst, F, K] neighbor
    tensors: the softmax over {neighbors} ∪ {self} is computed as a manual
    two-part stable softmax instead of concatenating a [cap_dst, 1, K, H]
    self slab onto the [cap_dst, F, K, H] messages.  Measured on v5e at the
    leaderboard layer-0 shape (1.08M src / 67.6k dst / F=15 / 4x64 heads):
    the concat formulation's BACKWARD spends ~16 ms/step in splits and
    layout copies of z-sized buffers that the split formulation never
    materializes — 31.7 -> 15.9 ms tail grad, identical numerics
    (BENCH_NOTES round 5 "GAT backward").
    """
    z = h_src @ p["w"]                                   # [cap_src, K*H]
    z = z.reshape(z.shape[0], heads, -1)                 # [cap_src, K, H]
    att_s = jnp.einsum("nkh,kh->nk", z, p["a_self"])     # [cap_src, K]
    att_n = jnp.einsum("nkh,kh->nk", z, p["a_neigh"])

    z_self = block_self(z, block)                        # [cap_dst, K, H]
    z_neigh = _neigh_msgs(z, block)                      # [cap_dst, F, K, H]
    as_dst = block_self(att_s, block)                    # [cap_dst, K]
    an_dst = block_self(att_n, block)
    an_nbr = _neigh_msgs(att_n, block)                   # [cap_dst, F, K]

    lrelu = lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    e_n = lrelu(as_dst[:, None, :] + an_nbr)             # [cap_dst, F, K]
    e_s = lrelu(as_dst + an_dst)                         # [cap_dst, K] self
    e_n = jnp.where(block.neigh_mask[..., None], e_n, _NEG)
    m = jnp.maximum(jnp.max(e_n, axis=1), e_s)           # [cap_dst, K]
    w_n = jnp.exp(e_n - m[:, None, :])
    w_s = jnp.exp(e_s - m)
    denom = jnp.sum(w_n, axis=1) + w_s                   # [cap_dst, K]
    alpha_n = (w_n / denom[:, None, :]).astype(z.dtype)
    alpha_s = (w_s / denom).astype(z.dtype)
    return (jnp.einsum("nfk,nfkh->nkh", alpha_n, z_neigh)
            + alpha_s[..., None] * z_self)


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
    del neigh_feats
    layers = params["layers"]
    assert len(mb.blocks) == len(layers), (
        f"minibatch has {len(mb.blocks)} blocks but model expects "
        f"{len(layers)}"
    )
    heads = cfg.num_heads

    def next_rng():
        nonlocal dropout_rng
        if dropout_rng is None:
            return None
        dropout_rng, sub = jax.random.split(dropout_rng)
        return sub

    h = feats
    last = len(layers) - 1
    for bi, (block, p) in enumerate(zip(mb.blocks, layers)):
        h = dropout(h, cfg.dropout, next_rng(), train)
        out = _gat_block(p, h, block, heads)             # [cap_dst, K, dim]
        if bi == last:
            h = out.mean(axis=1)                         # logits
        else:
            h = jax.nn.elu(out.reshape(out.shape[0], -1))
    return h
