"""int8 vs bf16 feature-tier A/B on the structure-dependent teacher task.

The int8 tier (storage/cache.py: per-column symmetric quantization with a
store-wide scale, dequant fused in-jit) is the rmat25-on-one-chip enabler —
a LOSSY tier, so its end-to-end accuracy cost must be measured, not assumed
(VERDICT r3 #2: "a quantized feature tier whose accuracy cost is unmeasured
is a claim, not a capability").

Trains the capacity-matched recipe (GraphSAGE hidden 256, fanout 10, the
recipe that clears the structure-blind MLP ceiling by ~29 points at
products scale, BENCH_NOTES r3) on the rmat20 bench graph under each
cache dtype with IDENTICAL seeds/schedules, then evaluates full-neighborhood
val accuracy on the on-device inference backend.  Also reports per-arm
throughput (same-run A/B — the only comparison the tunnel permits).

    python benchmarks/int8_ab.py [--epochs 16] [--arms int8,bfloat16]

Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--arms", default="bfloat16,int8",
                   help="comma list of cache dtypes to A/B")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--fanout", type=int, default=10)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--eval-backend", default="device",
                   choices=["host", "device"])
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator,
                                            use_fast_prng)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    use_fast_prng()

    import jax

    import pagraph_tpu as pg
    from bench import build_dataset
    from pagraph_tpu.models.inference import evaluate
    from pagraph_tpu.train.loop import Trainer

    ds = build_dataset(os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    arms = [a for a in args.arms.split(",") if a]
    results = {}
    for dtype in arms:
        m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=args.hidden,
                           feat_dim=100, n_classes=47, dropout=0.2)
        cfg = pg.Config(
            model=m,
            sampler=pg.SamplerConfig(batch_size=args.batch,
                                     fanout=args.fanout, num_hops=2,
                                     paired_draws=True),
            cache=pg.CacheConfig(dtype=dtype),
            train=pg.TrainConfig(lr=3e-3, warmup_epochs=1,
                                 on_device_sampling=True, scan_unroll=4,
                                 dtype="bfloat16"),
        )
        t0 = time.time()
        tr = Trainer.from_dataset(cfg, ds, seed=0, log=True)
        tr.train(args.epochs)
        train_s = time.time() - t0
        steady = tr.epoch_metrics[1:] or tr.epoch_metrics
        t1 = time.time()
        val = evaluate(jax.device_get(tr.state.params), cfg.model, ds.graph,
                       ds.features, ds.labels, ds.val_mask,
                       backend=args.eval_backend)
        results[dtype] = {
            "val_acc": round(float(val), 4),
            "edges_per_s": round(float(np.median(
                [e.edges / e.time_s for e in steady])), 1),
            "epoch_s": round(float(np.median(
                [e.time_s for e in steady])), 3),
            "final_train_acc": round(tr.epoch_metrics[-1].mean_acc, 4),
            "train_s": round(train_s, 1),
            "eval_s": round(time.time() - t1, 1),
        }
        log(f"[int8_ab] {dtype}: {results[dtype]}")

    out = {
        "metric": "int8_vs_bf16_val_acc",
        "value": results.get("int8", {}).get("val_acc"),
        "unit": "val_acc",
        "detail": {
            "workload": (f"graphsage h{args.hidden} fan{args.fanout} "
                         f"b{args.batch} x{args.epochs}ep, rmat20 "
                         f"({ds.num_nodes:,} v, {ds.graph.num_edges:,} e), "
                         f"2-hop teacher labels, same seeds both arms"),
            "arms": results,
            "acc_delta_int8_minus_bf16": (
                round(results["int8"]["val_acc"]
                      - results["bfloat16"]["val_acc"], 4)
                if {"int8", "bfloat16"} <= results.keys() else None),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
