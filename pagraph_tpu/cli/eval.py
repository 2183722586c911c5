"""Checkpoint-replay evaluation CLI (reference: examples/eval.py).

    python -m pagraph_tpu.cli.eval --dataset <dir> --ckpt-dir checkpoint \
        --arch gcn --n-layers 1 --n-hidden 32 [--interval 5]
"""
from __future__ import annotations

import argparse
import json

from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description="pagraph_tpu checkpoint eval")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--ckpt-dir", type=str, default="checkpoint")
    p.add_argument("--interval", type=int, default=1,
                   help="evaluate every Nth checkpoint")
    p.add_argument("--split", choices=["test", "val", "train"], default="test")
    p.add_argument("--backend", choices=["host", "device", "auto"],
                   default="auto",
                   help="full-graph aggregation: host scipy SpMM, on-device "
                        "chunked edge scatter, or auto (device at >=2M "
                        "edges — the scale default)")
    common.add_model_flags(p)
    args = p.parse_args(argv)

    common.setup_platform()
    from pagraph_tpu.data.formats import load_dataset
    from pagraph_tpu.train.checkpoint import evaluate_checkpoints

    ds = load_dataset(args.dataset)
    import pagraph_tpu as pg

    model = pg.ModelConfig(
        arch=args.arch, n_layers=args.n_layers, hidden=args.n_hidden,
        feat_dim=args.feat_size or ds.feat_dim,
        n_classes=args.n_classes or ds.num_classes,
        dropout=args.dropout, aggregator=args.agg,
        num_heads=args.num_heads,
        preprocess=getattr(args, "preprocess", False),
    )
    cfg = pg.Config(
        model=model,
        sampler=pg.SamplerConfig(num_hops=model.num_sampled_hops),
    )
    mask = getattr(ds, f"{args.split}_mask")
    results = evaluate_checkpoints(
        cfg, args.ckpt_dir, ds.graph, ds.features, ds.labels, mask,
        interval=args.interval, backend=args.backend,
    )
    for epoch, acc in sorted(results.items()):
        print(f"epoch {epoch}: {args.split} accuracy {acc:.4f}")
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
