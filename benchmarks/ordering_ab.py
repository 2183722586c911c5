"""A/B: degree/locality reordering (--ordering) vs plain vertex ids.

The reference INTENDED locality gains from its reordering pass but never
demonstrated them (and its implementation degenerated to a pure degree sort
— reference ordering.py:40 bug, SURVEY §2.2).  Ours implements the intent
(partition/ordering.py) and is invariant-tested, but through round 3 had no
measured effect on anything (VERDICT r3 #9).  This harness measures it on
the two paths where locality could plausibly pay:

  * partial-cache host pipeline (40% capacity, degree-ranked): hit rate,
    the tunnel-independent hit-path probe, and the host phase timers
    (sampling + miss-gather locality);
  * on-device whole-epoch path: edges/s (expected null: device gathers are
    transaction-bound and locality-insensitive, CLAUDE.md "Gather ceiling").

Same dataset, same seeds; the reordered arm relabels vertices with
``reorder_map`` (cluster=True, the intended neighbor-clustering behavior).

    python benchmarks/ordering_ab.py [--epochs 4]

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
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--cache-frac", type=float, default=0.4)
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator,
                                            use_fast_prng)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    use_fast_prng()

    import bench
    from pagraph_tpu.partition import apply_reordering, reorder_map

    ds = bench.build_dataset(os.path.expanduser("~/.cache/pagraph_tpu_bench"))
    t0 = time.time()
    vmap = reorder_map(ds.graph)
    ds_re = apply_reordering(ds, vmap)
    log(f"[ordering_ab] reorder_map + relabel in {time.time()-t0:.0f}s")

    results = {}
    cap = int(ds.num_nodes * args.cache_frac)
    for name, d in (("plain", ds), ("reordered", ds_re)):
        partial = bench.run(d, cache_enabled=True, epochs=args.epochs,
                            capacity=cap, hit_probe=True)
        device = bench.run(d, cache_enabled=True, epochs=args.epochs,
                           on_device=True, cache_dtype="bfloat16",
                           paired=True)
        results[name] = {
            "partial_hit_rate": round(1.0 - partial["miss_rate"], 4),
            "partial_edges_per_s": round(partial["edges_per_s"], 1),
            "partial_probe": partial.get("probe"),
            "partial_timers": {
                k: round(v["mean_ms"], 3)
                for k, v in partial["timers"].items()},
            "device_edges_per_s": round(device["edges_per_s"], 1),
        }
        log(f"[ordering_ab] {name}: {results[name]}")

    out = {
        "metric": "ordering_ab",
        "value": round(
            results["reordered"]["device_edges_per_s"]
            / max(results["plain"]["device_edges_per_s"], 1.0), 4),
        "unit": "reordered/plain device edges/s",
        "detail": {
            "workload": (f"rmat20 ({ds.num_nodes:,} v, "
                         f"{ds.graph.num_edges:,} e), partial cache "
                         f"{args.cache_frac:.0%} + on-device epoch, "
                         f"same seeds both arms"),
            "arms": results,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
