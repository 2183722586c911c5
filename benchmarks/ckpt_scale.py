"""Checkpoint/restore at rmat25 scale on the real chip (VERDICT r4 item #6/#7).

The orbax save/resume contract is pinned by CPU-mesh tests on toy graphs;
this executes it ONCE at the r4 headline scale (rmat25x16 int8 on-device,
0.53B edges on one chip): save mid-run, rebuild the trainer, resume, and
assert the resumed loss trajectory matches the uninterrupted run.

    python benchmarks/ckpt_scale.py [--scale 25] [--edge-factor 16]
        [--feat 64] [--epochs 4] [--ckpt-at 2]

Prints one JSON line with save/restore wall times and the trajectory check.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=25)
    p.add_argument("--edge-factor", type=int, default=16)
    p.add_argument("--feat", type=int, default=64)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--ckpt-at", type=int, default=2,
                   help="save every N epochs; resume from the last save")
    p.add_argument("--batch-size", type=int, default=6000)
    args = p.parse_args()

    from pagraph_tpu.utils.platform import (enable_compilation_cache,
                                            tune_host_allocator,
                                            use_fast_prng)
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    use_fast_prng()

    import pagraph_tpu as pg
    from pagraph_tpu.data.synthetic import random_split_masks, rmat_csr
    from pagraph_tpu.sampling.native import random_i8_native
    from pagraph_tpu.storage.feature_store import build_prequantized
    from pagraph_tpu.train.loop import Trainer

    t0 = time.time()
    graph = rmat_csr(args.scale, args.edge_factor, seed=1, backend="native")
    n = graph.num_nodes
    feats = random_i8_native((n, args.feat), seed=3)
    labels = (np.arange(n) % 47).astype(np.int64)   # timing/trajectory run
    train, _, _ = random_split_masks(n, train_frac=0.1, seed=4)
    train_nids = np.nonzero(train)[0]
    store = build_prequantized(graph, feats, 1.0 / 127.0)
    log(f"[ckpt] dataset ready in {time.time()-t0:.0f}s: "
        f"{n:,} v, {graph.num_edges:,} e")

    def build(ckpt_dir=None, every=0):
        cfg = pg.Config(
            model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16,
                                 feat_dim=args.feat, n_classes=47),
            sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                     num_hops=2, paired_draws=True),
            cache=pg.CacheConfig(dtype="int8"),
            train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                                 on_device_sampling=True, scan_unroll=2,
                                 ckpt_dir=ckpt_dir, ckpt_every=every),
        )
        return Trainer(cfg, store, graph, train_nids, labels, seed=0,
                       log=True)

    # uninterrupted reference trajectory
    full = build()
    t0 = time.time()
    full.train(args.epochs)
    full_s = time.time() - t0
    full_losses = [m.mean_loss for m in full.epoch_metrics]
    del full

    ckpt_dir = tempfile.mkdtemp(prefix="pagraph_ckpt_scale_")
    try:
        tr = build(ckpt_dir, args.ckpt_at)
        t0 = time.time()
        tr.train(args.ckpt_at)            # trains [0, ckpt_at), saves at end
        part_s = time.time() - t0
        part_losses = [m.mean_loss for m in tr.epoch_metrics]
        # orbax save time: measured directly for the record
        from pagraph_tpu.train.checkpoint import save_checkpoint
        t0 = time.time()
        save_checkpoint(ckpt_dir, "graphsage", 999, tr.state)
        save_s = time.time() - t0
        state_bytes = sum(
            np.asarray(x).nbytes
            for x in __import__("jax").tree.leaves(
                __import__("jax").device_get(tr.state)))
        del tr

        tr2 = build(ckpt_dir, args.ckpt_at)
        t0 = time.time()
        start = tr2.resume(args.ckpt_at - 1)
        restore_s = time.time() - t0
        assert start == args.ckpt_at, (start, args.ckpt_at)
        tr2.train(args.epochs, start_epoch=start)
        resumed = [m.mean_loss for m in tr2.epoch_metrics]
        match = bool(np.allclose(resumed, full_losses[start:], rtol=1e-5))
        max_dev = float(np.max(np.abs(
            np.asarray(resumed) - np.asarray(full_losses[start:]))))
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)

    out = {
        "metric": "ckpt_resume_trajectory_match",
        "value": match,
        "unit": "bool",
        "detail": {
            "workload": f"graphsage rmat{args.scale}x{args.edge_factor} "
                        f"int8 on-device ({n:,} v, {graph.num_edges:,} e), "
                        f"save@{args.ckpt_at}, resume to {args.epochs}",
            "save_s": round(save_s, 2),
            "restore_s": round(restore_s, 2),
            "state_bytes": int(state_bytes),
            "full_losses": [round(x, 6) for x in full_losses],
            "part_losses": [round(x, 6) for x in part_losses],
            "resumed_losses": [round(x, 6) for x in resumed],
            "max_loss_deviation": max_dev,
            "full_train_s": round(full_s, 1),
            "partial_train_s": round(part_s, 1),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
