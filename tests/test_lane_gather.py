"""lane_take == jnp.take on packed flat tables."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pagraph_tpu.ops.lane_gather import lane_take, pack_lanes


@pytest.mark.parametrize("n", [1, 127, 128, 129, 5000])
def test_lane_take_matches_take(n):
    rng = np.random.default_rng(n)
    flat = rng.integers(-(2**31), 2**31 - 1, n, dtype=np.int32)
    t2d = jnp.asarray(pack_lanes(flat))
    idx = jnp.asarray(rng.integers(0, n, 777, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(lane_take(t2d, idx)), flat[np.asarray(idx)])


def test_lane_take_nd_idx_and_jit():
    rng = np.random.default_rng(0)
    flat = rng.integers(0, 1000, 999, dtype=np.int32)
    t2d = jnp.asarray(pack_lanes(flat))
    idx = jnp.asarray(rng.integers(0, 999, (7, 13), dtype=np.int32))
    out = jax.jit(lane_take)(t2d, idx)
    assert out.shape == (7, 13)
    np.testing.assert_array_equal(np.asarray(out), flat[np.asarray(idx)])
