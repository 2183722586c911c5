"""Ablate the OGB-standard-shape step (batch 1024, fanout 5, 3 hops,
hidden 256) on the real chip: where do the milliseconds go?

Timing uses the fetch-differencing harness (CLAUDE.md: block_until_ready is
unreliable over the axon tunnel): each variant is a jitted scan over T
steps returning one scalar; per-step = (t_big - t_small) / (T_big - T_small),
which cancels the ~34 ms D2H fetch constant.

    python benchmarks/ablate_standard.py [--modes sample,gather,fwd,train]
                                         [--drop 0.5,0.0] [--dtype f32,bf16]
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root (pagraph_tpu pkg)
sys.path.insert(0, _HERE)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="sample,gather,fwd,train")
    p.add_argument("--drop", default="0.5,0.0")
    p.add_argument("--dtype", default="f32")
    p.add_argument("--t-big", type=int, default=32)
    p.add_argument("--t-small", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (
        enable_compilation_cache, tune_host_allocator, use_fast_prng)
    tune_host_allocator(2 << 30)
    enable_compilation_cache()
    use_fast_prng()

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from products_bench import build_dataset

    import pagraph_tpu as pg
    from pagraph_tpu.models import get_model
    from pagraph_tpu.sampling.device_sampler import (
        DeviceCSR, sample_minibatch_device)
    from pagraph_tpu.train.objective import masked_cross_entropy
    from pagraph_tpu.train.state import cast_apply

    cache_dir = os.environ.get(
        "PAGRAPH_BENCH_DATA", os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    ds = build_dataset(cache_dir, 21, 30, 100)

    B, FANOUT, HOPS, HID = 1024, 5, 3, 256
    train_ids = np.nonzero(ds.train_mask)[0].astype(np.int32)

    dev = jax.devices()[0]
    log(f"[ablate] device: {dev}")
    t0 = time.time()
    csr = DeviceCSR.from_graph(ds.graph, device=dev)
    feats = jax.device_put(jnp.asarray(ds.features), dev)
    labels_d = jax.device_put(jnp.asarray(ds.labels.astype(np.int32)), dev)
    train_d = jax.device_put(jnp.asarray(train_ids), dev)
    log(f"[ablate] H2D done in {time.time()-t0:.1f}s "
        f"({(csr.nbytes() + ds.features.nbytes)/1e9:.2f} GB)")

    def make_variant(mode, drop, dtype):
        from pagraph_tpu.models.common import set_dropout_impl
        # mode suffix "slow" = bernoulli dropout; default = uint16-bits
        set_dropout_impl(None if mode.endswith("slow") else 16)
        mode = mode.removesuffix("slow")
        model_cfg = pg.ModelConfig(arch="graphsage", n_layers=2, hidden=HID,
                                   feat_dim=100, n_classes=47, dropout=drop)
        init_fn, apply_fn = get_model(model_cfg)
        cdtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        apply_c = cast_apply(apply_fn, cdtype)
        params = init_fn(jax.random.key(0), model_cfg)
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)

        def step(carry, skey):
            params, opt_state, acc = carry
            k1, k2, k3 = jax.random.split(skey, 3)
            seeds = jnp.take(
                train_d, jax.random.randint(k1, (B,), 0, train_d.shape[0]))
            smask = jnp.ones((B,), bool)
            mb = sample_minibatch_device(csr, seeds, smask, HOPS, FANOUT, k2,
                                         labels=labels_d, paired=True)
            if mode == "sample":
                acc += jnp.sum(mb.layer_nids[0]).astype(jnp.float32)
                return (params, opt_state, acc), None
            x = jnp.take(feats, mb.input_nids, axis=0)
            if mode == "gather":
                acc += jnp.sum(x[:, 0])
                return (params, opt_state, acc), None

            def loss_fn(ps):
                logits = apply_c(ps, model_cfg, mb, x, train=True,
                                 dropout_rng=k3)
                return masked_cross_entropy(logits, mb.labels, mb.seed_mask)

            if mode == "fwd":
                acc += loss_fn(params)
                return (params, opt_state, acc), None
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, acc + loss), None

        def run_t(t):
            @jax.jit
            def f(params, opt_state, key):
                keys = jax.random.split(key, t)
                (p, o, acc), _ = jax.lax.scan(
                    step, (params, opt_state, jnp.float32(0)), keys, unroll=2)
                return acc
            return f

        return params, opt_state, run_t

    results = {}
    for mode, drop, dtype in itertools.product(
            args.modes.split(","),
            [float(d) for d in args.drop.split(",")],
            args.dtype.split(",")):
        if mode in ("sample", "gather") and (drop != 0.5 or dtype != "f32"):
            continue  # model params irrelevant
        params, opt_state, run_t = make_variant(mode, drop, dtype)
        fb, fs = run_t(args.t_big), run_t(args.t_small)
        key = jax.random.key(42)
        # compile both
        np.asarray(fs(params, opt_state, key))
        np.asarray(fb(params, opt_state, key))
        per = []
        for r in range(args.reps):
            t1 = time.time()
            np.asarray(fs(params, opt_state, jax.random.key(100 + r)))
            ts = time.time() - t1
            t1 = time.time()
            np.asarray(fb(params, opt_state, jax.random.key(200 + r)))
            tb = time.time() - t1
            per.append((tb - ts) / (args.t_big - args.t_small))
        ms = sorted(per)[len(per) // 2] * 1e3
        tag = f"{mode:7s} drop={drop} {dtype}"
        results[tag] = ms
        log(f"[ablate] {tag}: {ms:.3f} ms/step  (all: "
            + ", ".join(f"{x*1e3:.3f}" for x in per) + ")")

    log("[ablate] summary:")
    for tag, ms in results.items():
        log(f"  {tag}: {ms:.3f} ms/step")


if __name__ == "__main__":
    main()
