"""ICI halo feature exchange: numerical equivalence with direct gather."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pagraph_tpu.parallel.halo import (
    HaloPlan,
    HaloPlanner,
    exchange_features,
    halo_width_for,
    shard_features,
)
from pagraph_tpu.parallel.mesh import make_mesh


def _run_exchange(mesh, feat_stack, plans, axis="dp"):
    """plans: list of per-chip HaloPlan -> stacked; returns [P, cap0, D]."""
    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                           *plans)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp"), P("dp")), out_specs=P("dp"),
             check_vma=False)
    def go(shard, plan):
        plan = jax.tree.map(lambda x: x[0], plan)
        out = exchange_features(shard[0], plan, "dp")
        return out[None]

    return np.asarray(go(jnp.asarray(feat_stack), stacked))


def test_exchange_matches_direct_gather():
    nP = 4
    mesh = make_mesh(nP)
    rng = np.random.default_rng(0)
    N, D, cap0 = 1000, 8, 64
    features = rng.normal(size=(N, D)).astype(np.float32)
    stack, shard_rows = shard_features(features, nP)
    H = halo_width_for(cap0, nP, slack=4.0)  # generous: no drops
    planner = HaloPlanner(nP, shard_rows, H)

    plans, wants = [], []
    for p in range(nP):
        nids = rng.integers(0, N, size=cap0)
        mask = np.ones(cap0, dtype=bool)
        mask[-5:] = False                     # padded tail
        plans.append(planner.plan(nids, mask))
        want = features[nids].copy()
        want[~mask] = 0.0
        wants.append(want)

    out = _run_exchange(mesh, stack, plans)
    for p in range(nP):
        np.testing.assert_allclose(out[p], wants[p], rtol=1e-6)


def test_exchange_with_skewed_ownership():
    """All requests target one owner: exercises the H-overflow masking."""
    nP = 2
    mesh = make_mesh(2)
    rng = np.random.default_rng(1)
    N, D, cap0 = 64, 4, 32
    features = rng.normal(size=(N, D)).astype(np.float32)
    stack, shard_rows = shard_features(features, nP)
    H = 8                                      # deliberately too small
    planner = HaloPlanner(nP, shard_rows, H)
    # all owned by chip 0: cyclic ownership -> even vertex ids
    nids = 2 * rng.integers(0, N // 2, size=cap0).astype(np.int64)
    mask = np.ones(cap0, dtype=bool)
    plan = planner.plan(nids, mask)
    assert int(np.asarray(plan.valid).sum()) == H   # overflow dropped+masked
    plans = [plan, planner.plan(nids, mask)]
    out = _run_exchange(mesh, stack, plans)
    valid = np.asarray(plan.valid)
    np.testing.assert_allclose(out[0][valid], features[nids[valid]], rtol=1e-6)
    assert np.all(out[0][~valid] == 0.0)


def test_planner_roundtrip_identity():
    """Cyclic ownership: owner(v) = v % P, offset v // P."""
    planner = HaloPlanner(num_shards=4, shard_rows=100, halo_width=16)
    nids = np.array([20, 21, 22, 23, 24, 25])   # owners 0,1,2,3,0,1
    mask = np.ones(6, dtype=bool)
    plan = planner.plan(nids, mask)
    req = np.asarray(plan.req)
    assert req[0, 0] == 5 and req[1, 0] == 5 and req[2, 0] == 5
    slot = np.asarray(plan.slot)
    assert slot[0] == 0 * 16 + 0
    assert slot[1] == 1 * 16 + 0
    assert slot[4] == 0 * 16 + 1


def test_powerlaw_skew_no_drops():
    """Hub-heavy (low-id) batches must not overflow the static halo width:
    the round-1 contiguous ownership dropped most of such a batch; cyclic
    ownership keeps per-owner load within the slack (VERDICT r1 #6)."""
    nP = 4
    rng = np.random.default_rng(3)
    N, cap0 = 4096, 512
    H = halo_width_for(cap0, nP)               # default slack 1.5
    planner = HaloPlanner(nP, -(-N // nP), H)
    # zipf-ish: most requests hit the lowest ids (power-law hubs)
    nids = np.minimum(
        (rng.pareto(1.0, size=cap0) * 8).astype(np.int64), N - 1)
    mask = np.ones(cap0, dtype=bool)
    plan = planner.plan(nids, mask)
    drops = cap0 - int(np.asarray(plan.valid).sum())
    assert drops == 0, f"{drops} halo drops under power-law skew"
