"""Wide-batch HBM row gather, chunked.

Measured on v5e (2026-08-20, /tmp harness with the fetch-differencing
recipe, leaderboard shape): one 1.08M-row gather from a [1M, 128] table
runs 10.6-11.6 ms (~10.7 ns/row) regardless of dtype/width, but the SAME
gather split into ~8 sequential chunks runs 8.7 ms isolated and cuts the
full leaderboard train step 18.3 -> 16.9 ms (-7.6%, interleaved A/B) —
XLA pipelines the chunked gathers where the monolithic one serializes.
Splitting below ~128k rows is neutral-to-noise (the bench shape's 54k-row
gather measured no change), so chunking engages only above a threshold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# rows per chunk; gathers smaller than 2 chunks stay monolithic
_CHUNK_ROWS = 1 << 17


def chunked_take(table: jax.Array, ids: jax.Array, *,
                 chunk: int = None) -> jax.Array:
    """``jnp.take(table, ids, axis=0)``, split into sequential chunks when
    ``ids`` is large (static shapes; the split is a trace-time decision).
    ``chunk=None`` reads the module-level ``_CHUNK_ROWS`` at call time
    (tests shrink it to drive the chunked path at toy shapes)."""
    if chunk is None:
        chunk = _CHUNK_ROWS
    m = ids.shape[0]
    if m < 2 * chunk:
        return jnp.take(table, ids, axis=0)
    nsplit = m // chunk
    parts = [jnp.take(table, ids[i * chunk:(i + 1) * chunk], axis=0)
             for i in range(nsplit)]
    tail = ids[nsplit * chunk:]
    if tail.shape[0]:
        parts.append(jnp.take(table, tail, axis=0))
    return jnp.concatenate(parts, axis=0)
