"""Interleaved A/B: scan vs per-step vs pipelined epoch dispatch (leaderboard shape).

`TrainConfig.epoch_dispatch='steps'` issues one async dispatch per
minibatch instead of one whole-epoch lax.scan.  Measured outcome
(2026-08-20, recorded in BENCH_NOTES "per-step dispatch A/B"): +2.6% at
[15,10,5]/b1024/h256 (21.60 vs 22.16 ms/step, perfectly stable), and the
experiment settles dead-end #2 — the 16.9 ms/step "independent
dispatches" figure was mostly the missing state chain.  This harness
measures the REAL epoch, state chained, both modes interleaved in one
process (tunnel bandwidth swings ~2x between runs — same-run comparison
only):

    python benchmarks/dispatch_ab.py [--epochs-each 3] [--fanouts 15,10,5]

Timing: wall clock from dispatch start to the metrics fetch completing
(np.asarray, ~34 ms constant — negligible against multi-second epochs;
jax.block_until_ready is NOT trusted on axon).
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
    p.add_argument("--epochs-each", type=int, default=3)
    p.add_argument("--fanouts", default="15,10,5")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--unroll", type=int, default=4,
                   help="scan_unroll for the scan arm (the leaderboard "
                        "recipe default)")
    p.add_argument("--arms", default="scan,steps,pipelined",
                   help="comma-separated epoch_dispatch modes to interleave")
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator,
                                            use_fast_prng)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    use_fast_prng()

    import numpy as np

    import pagraph_tpu as pg
    from bench import build_dataset
    from pagraph_tpu.storage.feature_store import FeatureStore
    from pagraph_tpu.train.loop import Trainer

    ds = build_dataset(os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    store = FeatureStore.build(ds.graph, ds.features)
    fanouts = tuple(int(f) for f in args.fanouts.split(","))

    def make(dispatch):
        m = pg.ModelConfig(arch="graphsage", n_layers=len(fanouts) - 1,
                           hidden=args.hidden, feat_dim=100, n_classes=47,
                           dropout=0.5)
        cfg = pg.Config(
            model=m,
            sampler=pg.SamplerConfig(batch_size=args.batch, fanouts=fanouts,
                                     num_hops=len(fanouts),
                                     paired_draws=True),
            train=pg.TrainConfig(lr=1e-2, on_device_sampling=True,
                                 epoch_dispatch=dispatch,
                                 scan_unroll=args.unroll,
                                 dtype=args.compute_dtype),
        )
        return Trainer(cfg, store, ds.graph, ds.train_nids, ds.labels)

    arms = [a for a in args.arms.split(",") if a]
    trainers = {d: make(d) for d in arms}

    def run_epoch(tr, e):
        t0 = time.perf_counter()
        acc = tr._dispatch_device_epoch(e)
        vals = np.asarray(acc)
        dt = time.perf_counter() - t0
        return dt, vals

    for name, tr in trainers.items():
        tr._maybe_fill_cache()
        dt, _ = run_epoch(tr, 0)          # compile + warm
        log(f"[ab] {name:5s} warmup epoch {dt:.1f}s")

    times = {d: [] for d in arms}
    edges = {}
    for e in range(1, args.epochs_each + 1):
        for name, tr in trainers.items():
            dt, vals = run_epoch(tr, e)
            times[name].append(dt)
            steps = max(int(vals[2]), 1)
            edges[name] = float(vals[3])
            log(f"[ab] {name:5s} epoch {e}: {dt:.2f}s "
                f"({dt / steps * 1e3:.2f} ms/step, "
                f"{vals[3] / dt / 1e6:.2f}M edges/s)")

    med = {k: float(np.median(v)) for k, v in times.items()}
    # baseline is scan when it ran; otherwise the slowest arm — name it in
    # the JSON so speedup_best is never misread as scan-relative (ADVICE r4)
    base_name = "scan" if "scan" in med else max(med, key=med.get)
    base = med[base_name]
    out = {
        "metric": "leaderboard_epoch_s",
        **{f"{k}_s": round(v, 3) for k, v in med.items()},
        "baseline": base_name,
        "speedup_best": round(base / min(med.values()), 3),
        "detail": {
            "workload": (f"graphsage fanouts={list(fanouts)} "
                         f"b{args.batch} h{args.hidden} "
                         f"{args.compute_dtype} rmat20 "
                         f"({ds.num_nodes:,} v, {ds.graph.num_edges:,} e)"),
            **{f"{k}_epochs_s": [round(t, 3) for t in v]
               for k, v in times.items()},
            "edges_per_epoch": edges,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
