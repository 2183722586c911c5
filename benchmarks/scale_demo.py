"""Beyond-HBM scale demo: host-DRAM feature tier + partial HBM cache.

Demonstrates BASELINE.md config-#5 behavior (papers100M-class: features too
large for device HBM) at single-host scale: an RMAT graph whose feature
matrix exceeds what the chip can cache, trained with the degree-ranked
partial cache and host-DRAM miss path.

    python benchmarks/scale_demo.py [--scale 24] [--feat 600] [--epochs 3]

Prints one JSON line with edges/s, hit rate and epoch time.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=23, help="2^scale vertices")
    p.add_argument("--edge-factor", type=int, default=8)
    p.add_argument("--feat", type=int, default=600)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=6000)
    p.add_argument("--cache-frac", type=float, default=0.0,
                   help="0 = auto-size from HBM budget")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--on-device", action="store_true",
                   help="in-HBM regime instead: whole-epoch on-device "
                        "training (use with --feat small enough to cache)")
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (
        enable_compilation_cache,
        tune_host_allocator,
    )

    t0 = time.time()
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    if args.on_device:
        from pagraph_tpu.utils.platform import use_fast_prng
        use_fast_prng()
    log(f"[scale] allocator+cache ready in {time.time()-t0:.0f}s")

    import pagraph_tpu as pg
    from pagraph_tpu.data.formats import Dataset
    from pagraph_tpu.data.synthetic import random_split_masks, rmat_coo
    from pagraph_tpu.graph import CSRGraph
    from pagraph_tpu.train.loop import Trainer

    from pagraph_tpu.utils.platform import parallel_random

    import os
    cache_dir = os.path.expanduser(
        f"~/.cache/pagraph_tpu_bench/scale{args.scale}_{args.feat}"
    )
    t0 = time.time()
    if os.path.exists(os.path.join(cache_dir, "ok")):
        ld = lambda nm, mm=None: np.load(os.path.join(cache_dir, nm + ".npy"),
                                         mmap_mode=mm)
        graph = CSRGraph(ld("indptr"), ld("indices"), ld("out_degrees"))
        feats = ld("feat", "r")   # mmap: the host tier reads the page cache
        n = graph.num_nodes
        log(f"[scale] loaded cached graph in {time.time()-t0:.0f}s")
    else:
        coo = rmat_coo(args.scale, args.edge_factor, seed=1)
        graph = CSRGraph.from_coo(coo)
        del coo
        log(f"[scale] graph built in {time.time()-t0:.0f}s")
        n = graph.num_nodes
        feats = parallel_random((n, args.feat), seed=3)
        if os.environ.get("PAGRAPH_SCALE_SAVE"):
            # optional: this host's disk writes ~10MB/s, so persisting 20GB
            # usually costs more than regenerating (~12 min in RAM)
            os.makedirs(cache_dir, exist_ok=True)
            for nm, arr in [("indptr", graph.indptr),
                            ("indices", graph.indices),
                            ("out_degrees", graph.out_degrees),
                            ("feat", feats)]:
                np.save(os.path.join(cache_dir, nm + ".npy"), arr)
            open(os.path.join(cache_dir, "ok"), "w").write("ok")
    rng = np.random.default_rng(3)
    proj = rng.normal(size=(args.feat, 47)).astype(np.float32)
    labels = np.argmax(feats[:, :64] @ proj[:64], axis=1).astype(np.int64)
    train, val, test = random_split_masks(n, train_frac=0.1, seed=4)
    ds = Dataset(graph, feats, labels, train, val, test)
    feat_gb = feats.nbytes / 1e9
    log(f"[scale] graph ready in {time.time()-t0:.0f}s: {n:,} vertices, "
        f"{graph.num_edges:,} edges, features {feat_gb:.1f} GB")

    cfg = pg.Config(
        model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16,
                             feat_dim=args.feat, n_classes=47),
        sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                 num_hops=2, prefetch=3),
        cache=pg.CacheConfig(
            capacity=(int(n * args.cache_frac) if args.cache_frac else None),
            dtype="bfloat16" if args.bf16 else "float32",
        ),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                             on_device_sampling=args.on_device),
    )
    tr = Trainer.from_dataset(cfg, ds, seed=0, log=True)
    tr.train(args.epochs)
    steady = tr.epoch_metrics[1:] or tr.epoch_metrics
    eps = float(np.mean([m.edges / m.time_s for m in steady]))
    out = {
        "metric": "edges_per_s_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "detail": {
            "workload": f"graphsage rmat{args.scale} "
                        f"({n:,} v, {graph.num_edges:,} e, "
                        f"feat {feat_gb:.1f}GB "
                        f"{'on-device' if args.on_device else 'host tier'})",
            "cache_capacity_vertices": tr.cache.capacity,
            "cache_frac": round(tr.cache.capacity / n, 3),
            "hit_rate": round(1.0 - tr.epoch_metrics[-1].miss_rate, 4),
            "epoch_time_s": round(float(np.mean([m.time_s for m in steady])), 2),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
