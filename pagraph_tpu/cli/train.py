"""Flagship training CLI.

Covers the reference's whole trainer zoo with flag combinations
(reference: examples/profile/):

    pa_gcn.py / pa_gs.py    -> --arch gcn|graphsage (cache + partition on)
    dgl_gcn.py / dgl_gs.py  -> --no-cache --partition 1
    dgl_cache.py            -> --partition 1 (cache on, no partitioning)
    multi-chip              -> --partition N  (N <= jax.device_count())

Usage:
    python -m pagraph_tpu.cli.train --dataset <dir> [flags]
    python -m pagraph_tpu.cli.train --synthetic 10000 [flags]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description="pagraph_tpu trainer")
    p.add_argument("--dataset", type=str, default=None, help="dataset dir")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate a random graph with N vertices instead")
    p.add_argument("--synthetic-edges", type=int, default=0,
                   help="edges for --synthetic (default 16x vertices)")
    p.add_argument("--json", action="store_true",
                   help="print a final JSON summary line")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="run on N virtual host devices instead of the real "
                        "chips (dry-run multi-partition anywhere)")
    common.add_model_flags(p)
    common.add_sampler_flags(p)
    common.add_cache_flags(p)
    common.add_train_flags(p)
    common.add_partition_flags(p)
    common.add_multihost_flags(p)
    args = p.parse_args(argv)

    common.setup_platform(fast_prng=args.fast_prng,
                          cpu_devices=args.cpu_devices,
                          coordinator=args.coordinator,
                          num_processes=args.num_processes,
                          process_id=args.process_id)
    import jax

    is_proc0 = jax.process_index() == 0
    if args.coordinator and args.partition != jax.device_count():
        p.error(
            f"multi-process training needs --partition == global device "
            f"count ({jax.device_count()}), got {args.partition}"
        )

    from pagraph_tpu.data.formats import load_dataset
    from pagraph_tpu.data.synthetic import synthetic_dataset
    from pagraph_tpu.utils.timers import maybe_trace

    if args.synthetic:
        ds = synthetic_dataset(
            num_nodes=args.synthetic,
            num_edges=args.synthetic_edges or 16 * args.synthetic,
            feat_dim=args.feat_size or 600,
            num_classes=args.n_classes or 60,
            seed=args.seed,
            learnable=True,
        )
    elif args.dataset:
        ds = load_dataset(args.dataset)
    else:
        p.error("need --dataset or --synthetic")

    cfg = common.build_config(
        args, feat_dim=ds.feat_dim, n_classes=ds.num_classes
    )
    print(f"devices: {jax.devices()}", file=sys.stderr)

    with maybe_trace(args.profile_dir):
        if cfg.partition.num_parts > 1:
            from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
            mesh = make_mesh(cfg.partition.num_parts)
            if args.ordering:
                from pagraph_tpu.partition import apply_reordering, reorder_map
                ds = apply_reordering(ds, reorder_map(ds.graph))
            tr = DataParallelTrainer.from_dataset(
                cfg, ds, mesh=mesh, seed=args.seed, log=is_proc0,
                feature_source=args.feature_source,
                dispatch=("one2all" if getattr(args, "one2all", False)
                          else "one2one"),
            )
        else:
            if getattr(args, "one2all", False):
                raise SystemExit(
                    "--one2all needs --isolate and --partition N > 1 "
                    "(single-chip isolation is one2one by construction)"
                )
            from pagraph_tpu.train.loop import Trainer
            tr = Trainer.from_dataset(cfg, ds, seed=args.seed, log=True)
        start = tr.resume() if args.resume else 0
        summary = tr.train(args.epochs, start_epoch=start)

    if is_proc0:
        print(tr.timers.report(), file=sys.stderr)
        print(
            f"mean epoch time (excl. {cfg.train.warmup_epochs} warm-up): "
            f"{summary['mean_epoch_time_s']:.3f}s | "
            f"final loss {summary['final_loss']:.4f} | "
            f"miss rate {summary['miss_rate']:.1%}"
        )
        if args.json:
            out = {k: v for k, v in summary.items() if k != "phase_timers"}
            print(json.dumps(out))
    return summary


if __name__ == "__main__":
    main()
