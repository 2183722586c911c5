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


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
            train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def concat_skip(h: jax.Array, activation) -> jax.Array:
    """The reference's skip connection on the last hidden layer:
    ``cat((h, act(h)))`` doubling the width (gcn_nssc.py:20-21)."""
    return jnp.concatenate([h, activation(h)], axis=-1)
