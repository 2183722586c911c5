"""Loss and metrics over padded seed vertices.

Semi-supervised node classification: cross-entropy + Adam, matching the
reference trainer (examples/profile/pa_gcn.py:60-66, 93-97).  All reductions
mask out padding slots so the padded batch tail never contributes gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """Mean CE over valid seeds (matches torch CrossEntropyLoss mean)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    n = jnp.maximum(mask.sum(), 1)
    return -jnp.sum(jnp.where(mask, ll, 0.0)) / n.astype(logits.dtype)


def masked_accuracy(logits: jax.Array, labels: jax.Array,
                    mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels) & mask
    n = jnp.maximum(mask.sum(), 1)
    return correct.sum() / n
