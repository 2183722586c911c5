"""Miss-path overlap probe (VERDICT r4 item #3): does the partial-cache
epoch cost ``max(miss-H2D, compute)`` or their SUM?

Method (tunnel-aware: the axon link rate swings ~2x run to run, so every
quantity is measured in THIS run):

  1. partial-cache trainer  -> median steady epoch time + exact H2D bytes
     (``EpochMetrics.h2d_bytes``: packed i32/u8 + miss rows)
  2. full-cache trainer     -> median steady epoch time = the compute +
     non-miss-transfer component (same i32/u8 bytes ship in both)
  3. in-run link rate       -> two-size ``device_put`` differencing (the
     fixed ~34 ms fetch constant cancels)
  4. t_miss = (partial.h2d_bytes - full.h2d_bytes) / link_rate
     predicted_sum = full_epoch + t_miss
     predicted_max = max(full_epoch, t_miss)
     overlap = (predicted_sum - partial_epoch) / (predicted_sum - predicted_max)

overlap 1.0 = the miss transfer fully hides behind compute (epoch = max);
0.0 = fully serialized (epoch = sum).  Negative = partial epoch is slower
than even the serial prediction (host-side gather/quantize cost, loader
stalls).

    python benchmarks/overlap_probe.py [--scale 20] [--feat 100]
        [--cache-frac 0.4] [--cache-dtype float32] [--host-dtype float32]

Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_link_rate() -> float:
    """H2D bytes/s via two-size differencing (axon: put is async; a 1-elt
    fetch forces the drain and its ~34 ms constant cancels in the diff)."""
    import jax

    def put_time(nbytes: int) -> float:
        buf = np.empty(nbytes, dtype=np.uint8)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(buf)
            np.asarray(d[:1])
            ts.append(time.perf_counter() - t0)
            del d
        return float(np.median(ts))

    s1, s2 = 32 << 20, 256 << 20
    t1, t2 = put_time(s1), put_time(s2)
    return (s2 - s1) / max(t2 - t1, 1e-6)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=20)
    p.add_argument("--edge-factor", type=int, default=16)
    p.add_argument("--feat", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=6000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--cache-frac", type=float, default=0.4)
    p.add_argument("--cache-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"])
    p.add_argument("--host-dtype", default="float32",
                   choices=["float32", "int8"])
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()

    import pagraph_tpu as pg
    from pagraph_tpu.data.synthetic import random_split_masks, rmat_csr
    from pagraph_tpu.train.loop import Trainer

    t0 = time.time()
    graph = rmat_csr(args.scale, args.edge_factor, seed=1)
    n = graph.num_nodes
    if args.host_dtype == "int8":
        from pagraph_tpu.sampling.native import random_i8_native
        from pagraph_tpu.storage.feature_store import build_prequantized
        feats = random_i8_native((n, args.feat), seed=3)
        store = build_prequantized(graph, feats, 1.0 / 127.0)
    else:
        from pagraph_tpu.storage.feature_store import FeatureStore
        rng = np.random.default_rng(3)
        feats = rng.random((n, args.feat), dtype=np.float32)
        store = FeatureStore.build(graph, feats)
    labels = (np.arange(n) % 47).astype(np.int64)   # timing-only workload
    train, _, _ = random_split_masks(n, train_frac=0.1, seed=4)
    train_nids = np.nonzero(train)[0]
    log(f"[overlap] dataset ready in {time.time()-t0:.0f}s: "
        f"{n:,} v, {graph.num_edges:,} e")

    def run(capacity):
        cfg = pg.Config(
            model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16,
                                 feat_dim=args.feat, n_classes=47),
            sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                     num_hops=2, prefetch=3),
            cache=pg.CacheConfig(capacity=capacity, dtype=args.cache_dtype),
            train=pg.TrainConfig(lr=1e-2, warmup_epochs=1),
        )
        tr = Trainer(cfg, store, graph, train_nids, labels, seed=0, log=True)
        tr.train(args.epochs)
        steady = tr.epoch_metrics[1:]
        med_t = float(np.median([m.time_s for m in steady]))
        med_b = float(np.median([m.h2d_bytes for m in steady]))
        hit = 1.0 - tr.epoch_metrics[-1].miss_rate
        del tr
        return med_t, med_b, hit

    log("[overlap] partial-cache run...")
    t_part, b_part, hit = run(int(n * args.cache_frac))
    log(f"[overlap] partial: {t_part:.2f}s/epoch, "
        f"{b_part/1e6:.0f} MB/epoch H2D, hit {hit:.1%}")
    log("[overlap] full-cache run...")
    t_full, b_full, _ = run(n)
    log(f"[overlap] full: {t_full:.2f}s/epoch, {b_full/1e6:.0f} MB/epoch")
    rate = measure_link_rate()
    log(f"[overlap] link rate {rate/1e6:.0f} MB/s")

    miss_bytes = max(b_part - b_full, 0.0)
    t_miss = miss_bytes / rate
    pred_sum = t_full + t_miss
    pred_max = max(t_full, t_miss)
    denom = max(pred_sum - pred_max, 1e-9)
    overlap = (pred_sum - t_part) / denom
    out = {
        "metric": "miss_overlap_ratio",
        "value": round(float(overlap), 3),
        "unit": "1.0=max(miss,compute), 0.0=sum",
        "detail": {
            "workload": f"graphsage rmat{args.scale}x{args.edge_factor} "
                        f"feat {args.feat} host={args.host_dtype} "
                        f"cache={args.cache_dtype} frac={args.cache_frac}",
            "partial_epoch_s": round(t_part, 3),
            "full_epoch_s": round(t_full, 3),
            "miss_h2d_mb_per_epoch": round(miss_bytes / 1e6, 1),
            "link_rate_mb_s": round(rate / 1e6, 1),
            "t_miss_s": round(t_miss, 3),
            "predicted_sum_s": round(pred_sum, 3),
            "predicted_max_s": round(pred_max, 3),
            "hit_rate": round(hit, 4),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
