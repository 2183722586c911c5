"""Offline partitioning CLI (reference: PaGraph/partition/dg.py:107-171,
hash.py:31-70).

    python -m pagraph_tpu.cli.partition --dataset <dir> --partition P \
        --method dg --num-hops H [--ordering]

Writes ``<dir>/partition_<P>_<method>/`` with the reference's four-file
per-rank contract.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="pagraph_tpu partitioner")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--partition", type=int, default=2)
    p.add_argument("--method", choices=["dg", "hash", "kl"], default="dg")
    p.add_argument("--assign-backend", choices=["auto", "numpy", "native"],
                   default="auto",
                   help="dg greedy stream implementation (native = C++, "
                        "bit-identical, ~10x faster at scale)")
    p.add_argument("--num-hops", type=int, default=1)
    p.add_argument("--edge-balance", action="store_true",
                   help="dg: balance partition EDGE footprints (in_deg+1 "
                        "weights) instead of train-vertex counts — for the "
                        "edge-partitioned trainer, whose per-chip HBM pads "
                        "to max_p(E_p)")
    p.add_argument("--ordering", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from pagraph_tpu.utils.platform import tune_host_allocator
    tune_host_allocator(1 << 30)

    from pagraph_tpu.data.formats import (
        load_dataset, partition_dir, save_dataset, save_partition,
    )
    from pagraph_tpu.partition import (
        apply_reordering, dg_partition, hash_partition, kl_partition,
        partition_stats, reorder_map,
    )

    ds = load_dataset(args.dataset)
    if args.ordering:
        print("re-ordering graph...", file=sys.stderr)
        ds = apply_reordering(ds, reorder_map(ds.graph))
        save_dataset(args.dataset, ds)   # rewrite in place (reference behavior)

    if args.method == "dg":
        parts = dg_partition(ds.graph, ds.train_nids, ds.labels,
                             args.partition, args.num_hops,
                             backend=args.assign_backend,
                             edge_balance=args.edge_balance)
    elif args.method == "kl":
        parts = kl_partition(ds.graph, ds.train_nids, ds.labels,
                             args.partition, args.num_hops, seed=args.seed)
    else:
        parts = hash_partition(ds.graph, ds.train_nids, ds.labels,
                               args.partition, args.num_hops, seed=args.seed)

    out_dir = partition_dir(args.dataset, args.partition, args.method)
    os.makedirs(out_dir, exist_ok=True)
    for rank, part in enumerate(parts):
        save_partition(out_dir, rank, part)
        print(f"partition {rank}: {part.num_nodes} vertices "
              f"({len(part.train_nids)} train)", file=sys.stderr)
    stats = partition_stats(parts, ds.num_nodes)
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
