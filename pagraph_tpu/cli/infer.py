"""Batch inference CLI: full-graph predictions from a trained checkpoint.

    python -m pagraph_tpu.cli.infer --dataset <dir> --ckpt-dir checkpoint \
        --arch graphsage --n-hidden 32 --out preds.npy [--save-logits]

Loads the newest (or ``--epoch``) checkpoint, runs exact full-neighborhood
layer-wise inference over EVERY vertex (models/inference.full_graph_logits,
host or device backend) and writes the argmax predictions — the serving-side
complement of the reference's eval.py, which only prints test accuracy
(reference: examples/eval.py:28-46).
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from . import common


def main(argv=None):
    p = argparse.ArgumentParser(description="pagraph_tpu batch inference")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--ckpt-dir", type=str, default="checkpoint")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch; default = newest")
    p.add_argument("--out", type=str, required=True,
                   help="output .npy for int64 predictions [N]")
    p.add_argument("--save-logits", action="store_true",
                   help="also write <out>.logits.npy (float32 [N, C])")
    p.add_argument("--backend", choices=["host", "device"], default="host")
    common.add_model_flags(p)
    args = p.parse_args(argv)

    common.setup_platform()
    import pagraph_tpu as pg
    from pagraph_tpu.data.formats import load_dataset
    from pagraph_tpu.models.inference import full_graph_logits
    from pagraph_tpu.train.checkpoint import (list_checkpoints,
                                              restore_checkpoint)
    from pagraph_tpu.train.state import create_state

    ds = load_dataset(args.dataset)
    model = pg.ModelConfig(
        arch=args.arch, n_layers=args.n_layers, hidden=args.n_hidden,
        feat_dim=args.feat_size or ds.feat_dim,
        n_classes=args.n_classes or ds.num_classes,
        dropout=args.dropout, aggregator=args.agg,
        num_heads=args.num_heads,
        preprocess=getattr(args, "preprocess", False),
    )
    cfg = pg.Config(model=model,
                    sampler=pg.SamplerConfig(num_hops=model.num_sampled_hops))
    have = list_checkpoints(args.ckpt_dir, model.arch)
    if not have:
        raise SystemExit(f"no {model.arch} checkpoints under {args.ckpt_dir}")
    epoch = args.epoch if args.epoch is not None else have[-1]
    if epoch not in have:
        raise SystemExit(
            f"no epoch-{epoch} checkpoint under {args.ckpt_dir}; "
            f"available: {have}")
    template, _ = create_state(cfg)
    state = restore_checkpoint(args.ckpt_dir, model.arch, epoch, template)

    logits = full_graph_logits(state.params, model, ds.graph, ds.features,
                               backend=args.backend)
    preds = logits.argmax(axis=1).astype(np.int64)
    np.save(args.out, preds)
    if args.save_logits:
        np.save(args.out + ".logits.npy", logits.astype(np.float32))
    summary = {
        "epoch": int(epoch),
        "num_vertices": int(preds.shape[0]),
        "out": args.out,
    }
    for split in ("val", "test"):
        mask = np.asarray(getattr(ds, f"{split}_mask"), dtype=bool)
        if mask.any():
            summary[f"{split}_acc"] = float(
                (preds[mask] == ds.labels[mask]).mean())
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
