"""Block aggregation ops — XLA path.

The TPU-native replacement for DGL's ``block_compute(copy_src, reduce, ...)``
CUDA kernels (reference: PaGraph/model/gcn_nssc.py:71-74,
graphsage_nssc.py:97-127).  Because blocks are fixed-shape ``(cap_dst,
fanout)`` index matrices, "copy_src + segment-reduce" collapses to a dense
gather followed by a masked reduction over the fanout axis — shapes XLA can
tile straight onto the VPU/MXU.  (A fused Pallas gather+mean was measured
SLOWER than this XLA path on v5e — see ``ops/pallas_gather.py`` docstring
and BENCH_NOTES.md — so this module is the production path, not a fallback.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sampling.block import Block

_NEG_INF = -1e30


def gather_rows(h_src: jax.Array, positions: jax.Array) -> jax.Array:
    """``h_src[positions]`` with XLA gather; positions int32 of any shape."""
    return jnp.take(h_src, positions, axis=0)


def block_self(h_src: jax.Array, block: Block) -> jax.Array:
    """Representation of each dst vertex itself: [cap_dst, D]."""
    if block.prefix_layout:
        return h_src[:block.cap_dst]
    return jnp.take(h_src, block.self_pos, axis=0)


def _neigh_msgs(h_src: jax.Array, block: Block) -> jax.Array:
    """Neighbor messages [cap_dst, fanout, *feat_dims]: a contiguous
    slice+reshape in prefix layout (no gather; backward is a pad, not a
    scatter-add).  Trailing dims pass through (GAT feeds [cap, heads, H])."""
    if block.prefix_layout:
        n, f = block.cap_dst, block.fanout
        return h_src[n:n + n * f].reshape(n, f, *h_src.shape[1:])
    return jnp.take(h_src, block.neigh_pos, axis=0)


def block_aggregate(
    h_src: jax.Array,
    block: Block,
    kind: str = "mean",
) -> jax.Array:
    """Masked neighbor aggregation: [cap_src, D] -> [cap_dst, D].

    kind: 'mean' | 'sum' | 'max'.  Vertices with zero valid neighbors get a
    zero vector (DGL's empty-mailbox default, matched for parity).
    """
    msgs = _neigh_msgs(h_src, block)                     # [cap_dst, fanout, D]
    mask = block.neigh_mask[..., None]                   # [cap_dst, fanout, 1]
    count = jnp.sum(block.neigh_mask, axis=1, keepdims=True)  # [cap_dst, 1]
    if kind == "sum":
        return jnp.sum(jnp.where(mask, msgs, 0.0), axis=1)
    if kind == "mean":
        s = jnp.sum(jnp.where(mask, msgs, 0.0), axis=1)
        return s / jnp.maximum(count, 1).astype(s.dtype)
    if kind == "max":
        m = jnp.max(jnp.where(mask, msgs, _NEG_INF), axis=1)
        return jnp.where(count > 0, m, 0.0)
    raise ValueError(f"unknown aggregation kind {kind!r}")


def block_aggregate_lstm(
    h_src: jax.Array,
    block: Block,
    lstm_params: dict,
) -> jax.Array:
    """LSTM aggregator (reference: graphsage_nssc.py:112-125): run an LSTM
    over each vertex's (padded) neighbor sequence, return the final hidden
    state.  Masked steps carry state through unchanged, so padding slots do
    not perturb the result.  Implemented as ``lax.scan`` over the fanout axis.
    """
    msgs = _neigh_msgs(h_src, block)                     # [cap_dst, F, D]
    mask = block.neigh_mask                              # [cap_dst, F]
    cap_dst, fanout, _ = msgs.shape
    hidden = lstm_params["w_hh"].shape[0]

    def step(carry, xs):
        h, c = carry
        x, m = xs                                        # [cap_dst, D], [cap_dst]
        gates = (
            x @ lstm_params["w_ih"] + h @ lstm_params["w_hh"] + lstm_params["b"]
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        keep = m[:, None]
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)), None

    h0 = jnp.zeros((cap_dst, hidden), dtype=msgs.dtype)
    c0 = jnp.zeros((cap_dst, hidden), dtype=msgs.dtype)
    xs = (jnp.moveaxis(msgs, 1, 0), jnp.moveaxis(mask, 1, 0))
    (h_fin, _), _ = jax.lax.scan(step, (h0, c0), xs)
    return h_fin


def init_lstm_params(key: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(hidden)
    return {
        "w_ih": jax.random.uniform(k1, (in_dim, 4 * hidden), dtype, -scale, scale),
        "w_hh": jax.random.uniform(k2, (hidden, 4 * hidden), dtype, -scale, scale),
        "b": jnp.zeros((4 * hidden,), dtype),
    }
