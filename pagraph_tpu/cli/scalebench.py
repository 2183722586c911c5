"""Scaling-efficiency benchmark: edges/s across device counts.

The reference has no scaling harness — its multi-GPU numbers come from
manually launching ``examples/profile/pa_gcn.py`` with different ``--gpu``
lists and comparing epoch prints (reference: examples/profile/pa_gcn.py:
104-113).  This CLI automates that methodology for TPU meshes: train the
same workload on 1, 2, ..., N devices of the current platform and report
per-count edges/s plus strong-scaling efficiency vs the 1-device run
(ideal: N-device edges/s = N x 1-device edges/s, the BASELINE.md >=80%
target).

On a development host, ``--cpu-devices 8`` runs the identical sharded
program on virtual CPU devices — that validates the scaling *path*
(shardings, collectives, partition assignment), not silicon efficiency:
virtual devices share one CPU, so efficiency numbers are meaningful only
on a real multi-chip slice.

Usage:
    python -m pagraph_tpu.cli.scalebench --synthetic 20000 \
        --device-counts 1,2,4,8 --cpu-devices 8 --epochs 4
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from . import common


def _edges_per_s(metrics, warmup: int) -> float:
    steady = metrics[warmup:] or metrics
    edges = sum(m.edges for m in steady)
    secs = sum(m.time_s for m in steady)
    return edges / max(secs, 1e-9)


def run_one(cfg, ds, num_devices: int, seed: int,
            feature_source: str = "cache"):
    """Train the workload on ``num_devices`` devices; return edges/s."""
    import copy

    cfg = copy.deepcopy(cfg)
    cfg.partition.num_parts = num_devices
    cfg.validate()
    if num_devices > 1:
        from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

        mesh = make_mesh(num_devices)
        tr = DataParallelTrainer.from_dataset(cfg, ds, mesh=mesh, seed=seed,
                                              feature_source=feature_source)
    else:
        from pagraph_tpu.train.loop import Trainer

        tr = Trainer.from_dataset(cfg, ds, seed=seed)
    summary = tr.train(cfg.train.epochs)
    eps = _edges_per_s(tr.epoch_metrics, cfg.train.warmup_epochs)
    return eps, summary


def main(argv=None):
    p = argparse.ArgumentParser(description="pagraph_tpu scaling benchmark")
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic-edges", type=int, default=0)
    p.add_argument("--device-counts", type=str, default=None,
                   help="comma list, e.g. 1,2,4,8 (default: 1..all doubling)")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="use N virtual host devices (path validation mode)")
    p.add_argument("--json", action="store_true")
    p.add_argument("--feature-source", choices=["cache", "ici", "edge"],
                   default="cache",
                   help="multi-device feature placement (see cli.train); "
                        "'edge' = partition CSR + ICI-sharded features")
    common.add_model_flags(p)
    common.add_sampler_flags(p)
    common.add_cache_flags(p)
    common.add_train_flags(p)
    common.add_partition_flags(p)
    args = p.parse_args(argv)

    common.setup_platform(fast_prng=args.fast_prng,
                          cpu_devices=args.cpu_devices)
    import jax

    from pagraph_tpu.data.formats import load_dataset
    from pagraph_tpu.data.synthetic import synthetic_dataset

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

    avail = len(jax.devices())
    if args.device_counts:
        counts = [int(c) for c in args.device_counts.split(",")]
    else:
        counts, c = [], 1
        while c <= avail:
            counts.append(c)
            c *= 2
    bad = [c for c in counts if c > avail]
    if bad:
        p.error(f"device counts {bad} exceed available devices ({avail})")

    cfg = common.build_config(
        args, feat_dim=ds.feat_dim, n_classes=ds.num_classes
    )
    cfg.train.epochs = args.epochs

    raw = {c: run_one(cfg, ds, c, args.seed,
                      feature_source=(args.feature_source
                                      if c > 1 else "cache"))
           for c in counts}
    # per-device baseline = the smallest count measured (1-device when the
    # list includes 1), independent of the order counts were given in
    cmin = min(counts)
    base_eps = raw[cmin][0] / cmin
    rows = []
    for c in counts:
        eps, summary = raw[c]
        eff = eps / (base_eps * c)
        rows.append({"devices": c, "edges_per_s": eps, "efficiency": eff,
                     "final_loss": summary["final_loss"]})
        print(f"devices={c:3d}  {eps:12.0f} edges/s  "
              f"efficiency {eff:6.1%}  loss {summary['final_loss']:.4f}",
              file=sys.stderr)

    result = {"platform": jax.devices()[0].platform,
              "available_devices": avail, "runs": rows}
    if result["platform"] == "cpu":
        result["note"] = (
            "virtual CPU devices share one physical CPU: this validates the "
            "sharded program, not silicon scaling efficiency (flat TOTAL "
            "edges/s across counts is the expected ceiling here)"
        )
    if args.json:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
