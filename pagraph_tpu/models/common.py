"""Shared model building blocks (pure-pytree, no framework dependency)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, in_dim: int, out_dim: int, *,
                xavier_gain: Optional[float] = None, dtype=jnp.float32) -> dict:
    """Linear layer params.  Default torch-style Kaiming-uniform fan-in init
    (what ``nn.Linear`` gives the reference GCN); pass ``xavier_gain`` for the
    reference GraphSAGE's Xavier-uniform init (graphsage_nssc.py:17-19)."""
    wkey, bkey = jax.random.split(key)
    if xavier_gain is not None:
        bound = xavier_gain * jnp.sqrt(6.0 / (in_dim + out_dim))
    else:
        bound = 1.0 / jnp.sqrt(in_dim)
    w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)
    b_bound = 1.0 / jnp.sqrt(in_dim)
    b = jax.random.uniform(bkey, (out_dim,), dtype, -b_bound, b_bound)
    return {"w": w, "b": b}


def linear(params: dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, params["w"], preferred_element_type=x.dtype) + params["b"]


_DROPOUT_BITS: Optional[int] = 16


def set_dropout_impl(bits: Optional[int]) -> None:
    """Select the dropout mask source: ``16`` (default) = uint16 random bits
    compared against an integer threshold — half the RNG bit traffic of the
    float path and a constant multiply instead of a divide (dropout runs on
    the widest activation in the step, [cap_0, dim], so its bandwidth
    matters); ``None`` = ``jax.random.bernoulli`` float path.  Keep
    probability quantizes to 1/65536 under the bits path — statistically
    indistinguishable for dropout.  Streams differ between impls; switch
    only before building a train step, never mid-run."""
    global _DROPOUT_BITS
    if bits not in (None, 16):
        raise ValueError(f"unsupported dropout impl bits={bits!r}")
    _DROPOUT_BITS = bits


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
            train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    if rate >= 1.0:
        # degenerate config: keep nothing (and never divide by keep=0)
        return jnp.zeros_like(x)
    keep = 1.0 - rate
    if _DROPOUT_BITS == 16:
        thresh = min(int(round(keep * 65536.0)), 65535)
        bits = jax.random.bits(rng, x.shape, jnp.uint16)
        mask = bits < jnp.uint16(thresh)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x * x.dtype.type(1.0 / keep), 0.0)


def concat_skip(h: jax.Array, activation) -> jax.Array:
    """The reference's skip connection on the last hidden layer:
    ``cat((h, act(h)))`` doubling the width (gcn_nssc.py:20-21)."""
    return jnp.concatenate([h, activation(h)], axis=-1)
