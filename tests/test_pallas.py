"""Pallas kernels: interpreter-mode numerics on the CPU backend."""
import numpy as np
import jax.numpy as jnp
import pytest

from pagraph_tpu.ops.pallas_gather import gather_mean_pallas, gather_rows_pallas


def test_gather_rows_interpret():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(500, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 500, size=300).astype(np.int32))
    out = gather_rows_pallas(src, ids, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src)[np.asarray(ids)])


@pytest.mark.parametrize("fanout", [2, 4])
def test_gather_mean_interpret(fanout):
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(400, 128)).astype(np.float32))
    n = 200
    pos = jnp.asarray(rng.integers(0, 400, size=(n, fanout)).astype(np.int32))
    mask = jnp.asarray(rng.random((n, fanout)) > 0.3)
    got = gather_mean_pallas(src, pos, mask, fanout=fanout, tile=64,
                             interpret=True)
    s, p, m = np.asarray(src), np.asarray(pos), np.asarray(mask)
    want = (s[p] * m[..., None]).sum(1) / np.maximum(
        m.sum(1, keepdims=True), 1
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
