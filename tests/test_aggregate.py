"""Numerical tests of block aggregation vs a dense numpy reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pagraph_tpu.config import SamplerConfig
from pagraph_tpu.ops.aggregate import (
    block_aggregate,
    block_aggregate_lstm,
    block_self,
    init_lstm_params,
)
from pagraph_tpu.sampling.sampler import sample_minibatch


def _numpy_aggregate(h_src, block, kind):
    npos = np.asarray(block.neigh_pos)
    nmask = np.asarray(block.neigh_mask)
    cap_dst = npos.shape[0]
    out = np.zeros((cap_dst, h_src.shape[1]), dtype=np.float64)
    for d in range(cap_dst):
        rows = [h_src[npos[d, k]] for k in range(npos.shape[1]) if nmask[d, k]]
        if not rows:
            continue
        rows = np.stack(rows)
        if kind == "sum":
            out[d] = rows.sum(axis=0)
        elif kind == "mean":
            out[d] = rows.mean(axis=0)
        elif kind == "max":
            out[d] = rows.max(axis=0)
    return out


@pytest.mark.parametrize("kind", ["mean", "sum", "max"])
def test_block_aggregate_matches_dense(tiny_ds, kind):
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=24, fanout=3, num_hops=1, seed=21)
    caps = cfg.layer_capacities(g.num_nodes)
    rng = np.random.default_rng(0)
    mb = sample_minibatch(g, np.arange(24), cfg, caps, rng)
    block = mb.blocks[0]
    h_src = np.random.default_rng(1).normal(size=(caps[0], 16)).astype(np.float32)
    got = np.asarray(block_aggregate(jnp.asarray(h_src), block, kind))
    want = _numpy_aggregate(h_src, block, kind)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_block_self_gathers_dst_rows(tiny_ds):
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=24, fanout=3, num_hops=1, seed=22)
    caps = cfg.layer_capacities(g.num_nodes)
    rng = np.random.default_rng(0)
    mb = sample_minibatch(g, np.arange(24), cfg, caps, rng)
    h_src = np.random.default_rng(1).normal(size=(caps[0], 8)).astype(np.float32)
    got = np.asarray(block_self(jnp.asarray(h_src), mb.blocks[0]))
    want = h_src[np.asarray(mb.blocks[0].self_pos)]
    np.testing.assert_allclose(got, want)


def test_lstm_aggregator_ignores_padding(tiny_ds):
    """Padded neighbor slots must not change the LSTM final state."""
    g = tiny_ds.graph
    cfg = SamplerConfig(batch_size=16, fanout=4, num_hops=1, seed=23)
    caps = cfg.layer_capacities(g.num_nodes)
    rng = np.random.default_rng(0)
    mb = sample_minibatch(g, np.arange(16), cfg, caps, rng)
    block = mb.blocks[0]
    dim = 12
    h_src = jnp.asarray(
        np.random.default_rng(1).normal(size=(caps[0], dim)).astype(np.float32)
    )
    params = init_lstm_params(jax.random.PRNGKey(0), dim, dim)
    out1 = block_aggregate_lstm(h_src, block, params)
    # corrupt masked-slot positions: result must be identical
    npos = np.asarray(block.neigh_pos).copy()
    nmask = np.asarray(block.neigh_mask)
    npos[~nmask] = 3  # point padding at a different (valid) row
    import dataclasses
    block2 = dataclasses.replace(
        block, neigh_pos=jnp.asarray(npos)
    )
    out2 = block_aggregate_lstm(h_src, block2, params)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_chunked_take_matches_monolithic():
    """ops/gather.chunked_take == jnp.take above and below the chunk
    threshold (the split is a pure scheduling change)."""
    import jax.numpy as jnp
    import numpy as np

    from pagraph_tpu.ops.gather import chunked_take

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((500, 8), dtype=np.float32))
    for m, chunk in [(100, 32), (1000, 32), (1000, 256), (65, 32)]:
        ids = jnp.asarray(rng.integers(0, 500, size=m).astype(np.int32))
        got = chunked_take(tab, ids, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(jnp.take(tab, ids, axis=0)))
