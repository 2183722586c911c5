"""Full-graph inference (serving-side) benchmark: device vs host backend.

The reference's eval is offline checkpoint replay on CPU+GPU via DGL
(reference: examples/eval.py:28-46); here exact full-neighborhood
inference is a first-class API (`models/inference.full_graph_logits`)
with a host backend (scipy SpMM aggregation) and a device backend
(degree-bucketed padded gather windows — `_BucketedNeighborhoods`;
TPU scatter is ~1 us/edge so chunked edge scatters remain only for the
GAT per-edge-softmax path).  This prints the measured
wall-clock of BOTH on the rmat20 bench graph at the leaderboard model
shape — the number a serving user cares about:

    python benchmarks/infer_bench.py [--hidden 256] [--backends device,host]

Timing is honest wall-clock per full pass including the D2H fetch of the
logits (that IS the serving output); the device backend is run twice and
the second (warm) pass reported.
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
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--n-layers", type=int, default=2,
                   help="SAGE blocks minus one (2 = the 3-hop leaderboard "
                        "model)")
    p.add_argument("--backends", default="device,host")
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()

    import jax
    import numpy as np

    import pagraph_tpu as pg
    from bench import build_dataset
    from pagraph_tpu.models.inference import full_graph_logits
    from pagraph_tpu.train.state import create_state

    ds = build_dataset(os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    n, e = ds.num_nodes, ds.graph.num_edges
    m = pg.ModelConfig(arch="graphsage", n_layers=args.n_layers,
                       hidden=args.hidden, feat_dim=100, n_classes=47)
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=1024,
                                 num_hops=m.num_sampled_hops),
        train=pg.TrainConfig(on_device_sampling=True),
    )
    state, _ = create_state(cfg, seed=0)
    params = jax.device_get(state.params)

    results = {}
    for backend in args.backends.split(","):
        reps = 2 if backend == "device" else 1
        dt = None
        for r in range(reps):
            t0 = time.perf_counter()
            logits = full_graph_logits(params, m, ds.graph, ds.features,
                                       backend=backend)
            dt = time.perf_counter() - t0
            log(f"[infer] {backend} pass {r}: {dt:.2f}s "
                f"({n / dt / 1e6:.2f}M vertices/s)")
        assert logits.shape == (n, 47)
        results[backend] = dt

    dev = results.get("device")
    out = {
        "metric": "full_graph_inference_s",
        "value": round(dev if dev is not None
                       else list(results.values())[0], 3),
        "unit": "s/pass",
        "detail": {
            "workload": (f"graphsage {m.num_gnn_layers}-layer exact "
                         f"full-neighborhood, hidden {args.hidden}, rmat20 "
                         f"({n:,} v, {e:,} e, 100-dim)"),
            "passes_s": {k: round(v, 3) for k, v in results.items()},
            "vertices_per_s": {k: round(n / v, 1)
                               for k, v in results.items()},
            "speedup_device_over_host": (
                round(results["host"] / results["device"], 2)
                if {"host", "device"} <= results.keys() else None),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
