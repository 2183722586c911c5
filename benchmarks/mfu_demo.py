"""High-MFU demonstration shape (VERDICT r2 #9).

The standard OGB shape runs at 0.3-0.5% MFU because its per-batch matmuls
are tiny against its HBM gather transactions — a workload-shape bound, not
a kernel-quality bound (BENCH_NOTES "ceiling argument").  This demo runs
the SAME on-device training step at a matmul-heavy shape (wide features,
wide hidden, big batch) to show the MXU path scales once the arithmetic
intensity is there.

    python benchmarks/mfu_demo.py [--batch 4096] [--hidden 2048]
        [--feat 1024] [--fanout 5] [--dtype bfloat16]

Prints one JSON line with measured ms/step, analytic matmul GFLOP/step
(fwd + ~2x bwd), and MFU vs the v5e peak (197 TFLOP/s bf16, 98.5 f32).
Features are synthetic (random device-side) — MFU needs realistic SHAPES,
not realistic values; the CSR is the real rmat20 bench graph.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--hidden", type=int, default=2048)
    p.add_argument("--feat", type=int, default=1024)
    p.add_argument("--fanout", type=int, default=5)
    p.add_argument("--classes", type=int, default=47)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--t-big", type=int, default=24)
    p.add_argument("--t-small", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator,
                                            use_fast_prng)
    tune_host_allocator(2 << 30)
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
    from pagraph_tpu.train.state import (TrainState, cast_apply,
                                         compute_dtype, create_state)

    ds = build_dataset(os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    B, H, D0, F = args.batch, args.hidden, args.feat, args.fanout
    m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=H, feat_dim=D0,
                       n_classes=args.classes, dropout=0.0)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=B, fanout=F, num_hops=2,
                                 paired_draws=True),
        train=pg.TrainConfig(lr=3e-3, dtype=args.dtype),
    )
    hop_fanouts = cfg.sampler.hop_fanouts()
    csr = DeviceCSR.from_graph(ds.graph).with_rows()
    n = ds.num_nodes
    fdtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    feats = jax.random.normal(jax.random.PRNGKey(1), (n, D0), dtype=fdtype)
    labels_d = jnp.asarray(ds.labels.astype(np.int32) % args.classes)
    seeds = jnp.asarray(ds.train_nids[:B].astype(np.int32))
    smask = jnp.ones(B, dtype=bool)
    _, apply_fn = get_model(cfg.model)
    apply_fn = cast_apply(apply_fn, compute_dtype(cfg))
    state, tx = create_state(cfg, seed=0)

    cap1 = B * (F + 1)
    # analytic matmul flops, fwd: layer1 self+neigh [cap1, D0]x[D0, H],
    # layer2 self+neigh [B, 2H]x[2H, C]; bwd ~ 2x fwd (dgrad + wgrad)
    fwd_gf = (2 * cap1 * D0 * H * 2 + 2 * B * 2 * H * args.classes * 2) / 1e9
    step_gf = 3 * fwd_gf

    def make_epoch(T):
        # csr/labels ride as jit ARGUMENTS: closed-over device arrays embed
        # as HLO constants and the axon remote compile dies with HTTP 413
        # (CLAUDE.md "Remote-compile payload limit")
        @jax.jit
        def run(state, feats, csr, labels_d, key):
            def one(carry, skey):
                state = carry
                mb = sample_minibatch_device(
                    csr, seeds, smask, 2, hop_fanouts, skey,
                    labels=labels_d, paired=True)
                f = jnp.take(feats, mb.input_nids, axis=0
                             ).astype(jnp.float32)
                rng, sub = jax.random.split(state.rng)

                def loss_fn(params):
                    logits = apply_fn(params, cfg.model, mb, f, train=True,
                                      dropout_rng=sub)
                    return masked_cross_entropy(logits, mb.labels,
                                                mb.seed_mask)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                import optax
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(params=params, opt_state=opt_state,
                                  step=state.step + 1, rng=rng), loss

            state, losses = jax.lax.scan(one, state,
                                         jax.random.split(key, T))
            return losses[-1].reshape(1)
        return run

    big, small = make_epoch(args.t_big), make_epoch(args.t_small)
    key = jax.random.PRNGKey(3)
    float(np.asarray(big(state, feats, csr, labels_d, key))[0])
    float(np.asarray(small(state, feats, csr, labels_d, key))[0])
    per = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(np.asarray(small(state, feats, csr, labels_d, key))[0])
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(big(state, feats, csr, labels_d, key))[0])
        tb = time.perf_counter() - t0
        per.append((tb - ts) / (args.t_big - args.t_small))
    step_s = float(np.median(per))
    peak = 197e12 if args.dtype == "bfloat16" else 98.5e12
    mfu = step_gf * 1e9 / step_s / peak
    out = {
        "metric": "mfu_demo",
        "value": round(100 * mfu, 2),
        "unit": "% of v5e peak",
        "detail": {
            "shape": f"graphsage b{B} fanout{F}x2 feat{D0} hidden{H} "
                     f"{args.dtype}",
            "ms_per_step": round(step_s * 1e3, 3),
            "gflop_per_step": round(step_gf, 1),
            "tflops": round(step_gf / step_s / 1e3, 1),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
