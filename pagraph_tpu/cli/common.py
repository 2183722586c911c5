"""Shared CLI plumbing: config flags -> Config, platform setup.

One flag surface shared by every command replaces the reference's
re-declared per-script argparse contracts (reference: pa_gcn.py:117-151,
pa_server.py:84-109, README.md:115-117).
"""
from __future__ import annotations

import argparse

import pagraph_tpu as pg


def add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--arch",
                   choices=["gcn", "graphsage", "gcn_cv", "gat", "gin"],
                   default="gcn")
    p.add_argument("--n-layers", type=int, default=1,
                   help="hidden layers (total GNN layers = n_layers + 1)")
    p.add_argument("--n-hidden", type=int, default=32)
    p.add_argument("--n-classes", type=int, default=0,
                   help="0 = infer from labels")
    p.add_argument("--feat-size", type=int, default=0,
                   help="0 = infer from features")
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--agg", choices=["mean", "gcn", "pool", "lstm"],
                   default="mean")
    p.add_argument("--num-heads", type=int, default=4,
                   help="gat attention heads (must match the checkpoint "
                        "when evaluating)")
    p.add_argument("--preprocess", action="store_true",
                   help="server-side layer-0 pre-aggregation (one hop less)")


def add_sampler_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch-size", type=int, default=6000)
    p.add_argument("--num-neighbors", type=str, default="2",
                   help="fanout per hop: one value ('2') or a per-layer "
                        "list, input-side first like DGL ('15,10,5'; "
                        "must have one entry per sampled hop)")
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--sampler-backend", choices=["auto", "numpy", "native"],
                   default="auto")
    p.add_argument("--paired-draws", action="store_true",
                   help="on-device sampler: serve a vertex's fanout slots "
                        "from ONE aligned 32 B adjacency row gather "
                        "(uniform marginals, window-correlated slots; "
                        "deg<=fanout draws with replacement) — +12%% "
                        "epoch throughput measured on v5e")


def add_cache_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--no-cache", action="store_true",
                   help="disable the HBM feature cache (DGL-baseline mode)")
    p.add_argument("--cache-dtype", choices=["float32", "bfloat16", "int8"],
                   default="float32",
                   help="feature storage dtype: bfloat16 halves cache HBM / "
                        "miss H2D / ICI halo bytes, int8 quarters them "
                        "(per-column symmetric quantization; dequant is "
                        "fused into the first consumer inside jit)")
    p.add_argument("--cache-capacity", type=int, default=0,
                   help="vertices; 0 = auto-size from free HBM")


def add_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--lr", type=float, default=3e-2)
    p.add_argument("--lr-schedule", choices=["none", "cosine"],
                   default="none",
                   help="cosine: decay lr to 5%% over --lr-decay-steps "
                        "optimizer steps (beyond-reference)")
    p.add_argument("--lr-decay-steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation accuracy via full-neighborhood "
                        "inference every N epochs (0 = off)")
    p.add_argument("--eval-backend", choices=["host", "device"],
                   default="host",
                   help="full-graph inference backend for --eval-every: "
                        "host scipy SpMM, or chunked edge scatters on the "
                        "accelerator (much faster at millions of vertices)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in --ckpt-dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--isolate", action="store_true",
                   help="isolation mode: sampling in worker processes "
                        "(reference pa_iso.py)")
    p.add_argument("--one2all", action="store_true",
                   help="with --isolate --partition N: ONE sampler pool "
                        "over the full graph round-robins every chip "
                        "(reference cache_server); default one2one = a "
                        "pool per chip over its partition")
    p.add_argument("--fast-prng", action="store_true",
                   help="rbg PRNG for dropout/sampling draws (~25% faster "
                        "on-device epochs; different random streams than "
                        "the default threefry)")
    p.add_argument("--on-device", action="store_true",
                   help="sample on the TPU inside jit; one dispatch per "
                        "epoch (needs graph + features in HBM)")
    p.add_argument("--epoch-dispatch", choices=["scan", "steps"],
                   default="scan",
                   help="on-device epoch driver: scan = whole epoch in ONE "
                        "dispatch; steps = one async dispatch per minibatch "
                        "(+2.6%% at the [15,10,5]/b1024/h256 shape, ~2.6x "
                        "faster compile; slower at small steps; single-chip "
                        "only)")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="model fwd/bwd dtype; bfloat16 doubles MXU matmul "
                        "throughput (master params/optimizer stay f32)")
    p.add_argument("--halo-pipeline", action="store_true",
                   help="edge mode: sample + halo-exchange batch i+1 "
                        "inside batch i's step so the all_to_all can "
                        "overlap compute (identical trajectory)")


def add_partition_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--partition", type=int, default=1,
                   help="number of partitions / chips")
    p.add_argument("--partition-method", choices=["dg", "hash", "kl"], default="dg")
    p.add_argument("--edge-balance", action="store_true",
                   help="dg: balance partition EDGE footprints (in_deg+1 "
                        "weights) — for edge-partitioned training, whose "
                        "per-chip HBM pads to the largest partition")
    p.add_argument("--ordering", action="store_true",
                   help="locality reordering before partitioning")


def build_config(args, *, feat_dim: int, n_classes: int) -> pg.Config:
    model = pg.ModelConfig(
        arch=args.arch,
        n_layers=args.n_layers,
        hidden=args.n_hidden,
        feat_dim=args.feat_size or feat_dim,
        n_classes=args.n_classes or n_classes,
        dropout=args.dropout,
        aggregator=args.agg,
        num_heads=getattr(args, "num_heads", 4),
        preprocess=getattr(args, "preprocess", False),
    )
    nn = [int(x) for x in str(args.num_neighbors).split(",")]
    cfg = pg.Config(
        model=model,
        sampler=pg.SamplerConfig(
            batch_size=args.batch_size,
            fanout=nn[0],
            fanouts=tuple(nn) if len(nn) > 1 else None,
            num_hops=model.num_sampled_hops,
            prefetch=args.prefetch,
            backend=args.sampler_backend,
            seed=args.seed,
            paired_draws=getattr(args, "paired_draws", False),
        ),
        cache=pg.CacheConfig(
            enabled=not args.no_cache,
            capacity=args.cache_capacity or None,
            dtype=getattr(args, "cache_dtype", "float32"),
        ),
        partition=pg.PartitionConfig(
            num_parts=getattr(args, "partition", 1),
            method=getattr(args, "partition_method", "dg"),
            num_hops=model.num_sampled_hops,
            edge_balance=getattr(args, "edge_balance", False),
        ),
        train=pg.TrainConfig(
            lr=args.lr,
            lr_schedule=getattr(args, "lr_schedule", "none"),
            lr_decay_steps=getattr(args, "lr_decay_steps", 0),
            epochs=args.epochs,
            log_every=args.log_every,
            ckpt_dir=args.ckpt_dir,
            ckpt_every=args.ckpt_every,
            eval_every=getattr(args, "eval_every", 0),
            eval_backend=getattr(args, "eval_backend", "host"),
            remote_sampling=getattr(args, "isolate", False),
            on_device_sampling=getattr(args, "on_device", False),
            epoch_dispatch=getattr(args, "epoch_dispatch", "scan"),
            halo_pipeline=getattr(args, "halo_pipeline", False),
            dtype=getattr(args, "compute_dtype", "float32"),
        ),
    )
    return cfg


def add_multihost_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0; presence enables "
                        "multi-process (multi-host) training over "
                        "jax.distributed")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--feature-source", choices=["cache", "ici", "edge"],
                   default="cache",
                   help="multi-chip feature placement: per-chip HBM cache "
                        "of its partition; the full matrix disjointly "
                        "sharded over the mesh with all_to_all halo fetch "
                        "(ici, full CSR replicated); or edge = partition "
                        "CSR per chip + sharded features (E/P + N*dim/P "
                        "per-chip HBM, needs --on-device-sampling)")


def setup_platform(warm_bytes: int = 1 << 30,
                   fast_prng: bool = False,
                   cpu_devices: int = 0,
                   coordinator: "str | None" = None,
                   num_processes: int = 1,
                   process_id: int = 0) -> None:
    if cpu_devices:
        # Virtual host devices for multi-chip runs without the chips (the
        # same fake backend tests/conftest.py uses).  Legal only before the
        # first backend initialization: XLA reads XLA_FLAGS at backend
        # creation, and jax_platforms is mutable until then.
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={cpu_devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if coordinator:
        from pagraph_tpu.parallel.multihost import init_distributed

        init_distributed(coordinator, num_processes, process_id)

    from pagraph_tpu.utils.platform import (
        enable_compilation_cache,
        tune_host_allocator,
        use_fast_prng,
    )

    tune_host_allocator(warm_bytes)
    enable_compilation_cache()
    if fast_prng:
        use_fast_prng()
