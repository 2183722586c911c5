"""Leaderboard-shape ([15,10,5] / b1024 / h256) step ablation harness.

Reproduces the round-3 measurements behind BENCH_NOTES "Leaderboard-shape
step decomposition", the dedup DEAD END, and the chunked-gather win:

    python benchmarks/lb_ablate.py [--modes sample,gather,fwd,train,dedup]
                                   [--splits 1,8]

Timing: K async dispatches, ONE fetch at the end — per-call =
(tK - t1)/(K - 1).  Fetching every call adds the ~34 ms axon D2H constant
to every number (the round-2 harness artifact).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="sample,gather,fwd,train,dedup")
    p.add_argument("--splits", default="1,8",
                   help="gather chunk counts to A/B inside the full step")
    p.add_argument("--k", type=int, default=16)
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator,
                                            use_fast_prng)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    use_fast_prng()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pagraph_tpu as pg
    from bench import build_dataset
    from pagraph_tpu.models import get_model
    from pagraph_tpu.sampling.device_sampler import (DeviceCSR,
                                                     sample_minibatch_device)
    from pagraph_tpu.train.objective import masked_cross_entropy
    from pagraph_tpu.train.state import (cast_apply, compute_dtype,
                                         create_state)

    K = args.k
    B = 1024
    ds = build_dataset(os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    n = ds.num_nodes
    m = pg.ModelConfig(arch="graphsage", n_layers=2, hidden=256,
                       feat_dim=100, n_classes=47, dropout=0.5)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=B, fanouts=(15, 10, 5),
                                 num_hops=3, paired_draws=True),
        train=pg.TrainConfig(lr=3e-3, dtype="bfloat16"),
    )
    hop_fanouts = cfg.sampler.hop_fanouts()
    csr = DeviceCSR.from_graph(ds.graph).with_rows()
    feats = jnp.asarray(
        np.pad(ds.features, ((0, 0), (0, 28))).astype(np.float32)
    ).astype(jnp.bfloat16)
    labels_d = jnp.asarray(ds.labels.astype(np.int32))
    seeds = jnp.asarray(ds.train_nids[:B].astype(np.int32))
    smask = jnp.ones(B, dtype=bool)
    key0 = jax.random.PRNGKey(7)
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    state, tx = create_state(cfg, seed=0)

    def timeit2(name, fn, *a):
        # (tK - t1)/(K-1): K async dispatches, one D2H fetch at the end;
        # differencing cancels the ~34 ms axon fetch constant.
        float(np.asarray(fn(*a))[0])
        t0 = time.perf_counter()
        float(np.asarray(fn(*a))[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = None
        for _ in range(K):
            r = fn(*a)
        float(np.asarray(r)[0])
        tK = time.perf_counter() - t0
        per = (tK - t1) / (K - 1)
        log(f"[lb] {name:30s} {per*1e3:8.2f} ms/call")
        return per

    def sample(key):
        return sample_minibatch_device(csr, seeds, smask, 3, hop_fanouts,
                                       key, labels=labels_d, paired=True)

    modes = args.modes.split(",")
    if "sample" in modes:
        timeit2("sample", jax.jit(
            lambda key: jnp.sum(sample(key).layer_nids[0] % 97
                                ).astype(jnp.float32).reshape(1)), key0)
    if "gather" in modes:
        @jax.jit
        def g(key, feats):
            mb = sample(key)
            f = jnp.take(feats, mb.input_nids, axis=0).astype(jnp.float32)
            return jnp.sum(f[:, 0]).reshape(1)
        timeit2("sample+gather", g, key0, feats)
    if "fwd" in modes:
        @jax.jit
        def fw(params, key, feats):
            mb = sample(key)
            f = jnp.take(feats, mb.input_nids, axis=0
                         ).astype(jnp.float32)[:, :100]
            logits = apply_fn(params, cfg.model, mb, f, train=False)
            return masked_cross_entropy(logits, mb.labels, mb.seed_mask
                                        ).reshape(1)
        timeit2("sample+gather+fwd(eval)", fw, state.params, key0, feats)
    if "train" in modes:
        def make_step(nsplit):
            from pagraph_tpu.ops.gather import chunked_take

            @jax.jit
            def full(state, key, feats):
                mb = sample(key)
                ids = mb.input_nids
                if nsplit > 1:
                    f = chunked_take(feats, ids,
                                     chunk=ids.shape[0] // nsplit)
                else:
                    f = jnp.take(feats, ids, axis=0)
                f = f.astype(jnp.float32)[:, :100]

                def loss_fn(params):
                    logits = apply_fn(params, cfg.model, mb, f, train=True,
                                      dropout_rng=jax.random.fold_in(key, 1))
                    return masked_cross_entropy(logits, mb.labels,
                                                mb.seed_mask)
                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                tx.update(grads, state.opt_state, state.params)
                return loss.reshape(1)
            return full
        for s_ in args.splits.split(","):
            timeit2(f"full step, gather split-{s_}", make_step(int(s_)),
                    state, key0, feats)
    if "dedup" in modes:
        @jax.jit
        def dd(key):
            mb = sample(key)
            ids = mb.layer_nids[0]
            pos = jnp.arange(ids.shape[0], dtype=jnp.int32)
            buf = jnp.zeros(n, dtype=jnp.int32).at[ids].set(pos, mode="drop")
            winner = buf[ids]
            rank = jnp.cumsum((winner == pos).astype(jnp.int32)) - 1
            return jnp.sum(rank[winner] % 91).astype(jnp.float32).reshape(1)
        timeit2("dedup primitive (scatter)", dd, key0)

        @jax.jit
        def uniq(key):
            mb = sample(key)
            ids = mb.layer_nids[0]
            pos = jnp.arange(ids.shape[0], dtype=jnp.int32)
            buf = jnp.zeros(n, dtype=jnp.int32).at[ids].set(pos, mode="drop")
            return jnp.sum(buf[ids] == pos).astype(jnp.float32).reshape(1)
        u = float(np.asarray(uniq(key0))[0])
        cap0 = B
        for f_ in hop_fanouts:
            cap0 *= f_ + 1
        log(f"[lb] unique layer-0 fraction: {u:.0f}/{cap0} = {u/cap0:.3f}")


if __name__ == "__main__":
    main()
