"""Preprocess (hop-elimination) A/B — PaGraph's headline trick, measured
on TPU (VERDICT r4 item #5; reference: server/pa_server.py:45-52).

``--preprocess on``: the store serves the one-time full-graph mean
aggregation as a second fused field (``neigh``), the sampler expands ONE
hop less, and layer 0 consumes the precomputed aggregate.  ``off``: plain
2-hop sampling.  Same model depth, same seeds, same-run interleave (the
only comparison the tunnel permits); accuracy judged by full-neighborhood
val inference on RAW features for both arms.

    python benchmarks/preprocess_ab.py [--epochs 8] [--hidden 16]
        [--fanout 2] [--batch 6000]

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
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--fanout", type=int, default=2)
    p.add_argument("--batch", type=int, default=6000)
    p.add_argument("--eval-backend", default="device",
                   choices=["host", "device", "auto"])
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
    results = {}
    for pre in (False, True):
        m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=args.hidden,
                           feat_dim=100, n_classes=47, dropout=0.2,
                           preprocess=pre)
        cfg = pg.Config(
            model=m,
            sampler=pg.SamplerConfig(batch_size=args.batch,
                                     fanout=args.fanout,
                                     num_hops=m.num_sampled_hops,
                                     paired_draws=True),
            cache=pg.CacheConfig(),
            train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                                 on_device_sampling=True, scan_unroll=4),
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
        key = "preprocess" if pre else "plain_2hop"
        results[key] = {
            "val_acc": round(float(val), 4),
            "epoch_s": round(float(np.median(
                [e.time_s for e in steady])), 3),
            "edges_per_s": round(float(np.median(
                [e.edges / e.time_s for e in steady])), 1),
            "edges_per_epoch": int(steady[-1].edges),
            "sampled_hops": m.num_sampled_hops,
            "train_s": round(train_s, 1),
        }
        log(f"[pre_ab] {key}: {results[key]}")

    spd = (results["plain_2hop"]["epoch_s"]
           / max(results["preprocess"]["epoch_s"], 1e-9))
    out = {
        "metric": "preprocess_epoch_speedup",
        "value": round(spd, 3),
        "unit": "x (plain / preprocess epoch time)",
        "detail": {
            "workload": (f"graphsage h{args.hidden} fan{args.fanout} "
                         f"b{args.batch} x{args.epochs}ep, rmat20 "
                         f"({ds.num_nodes:,} v, {ds.graph.num_edges:,} e), "
                         f"on-device epochs, same seeds both arms"),
            "arms": results,
            "acc_delta_pre_minus_plain": round(
                results["preprocess"]["val_acc"]
                - results["plain_2hop"]["val_acc"], 4),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
