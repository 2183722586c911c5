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


def _teacher_labels(graph, feats, dims: int = 32) -> np.ndarray:
    """Structure-dependent 2-hop teacher labels over a ``dims``-wide feature
    slice (VERDICT r2 #1; the slice bounds the SpMM scratch to n*dims*4
    bytes per hop at 100M-vertex scale).  Chunked scoring above 30M
    vertices (the [N, 47] score matrices are 25 GB each at rmat27).
    Faults every feature page — generator-time only; steady-state workers
    load the persisted labels_nbr.npy."""
    from pagraph_tpu.data.synthetic import neighborhood_labels

    x = np.ascontiguousarray(feats[:, :dims], dtype=np.float32)
    if x.dtype != feats.dtype and feats.dtype == np.int8:
        x /= 127.0                      # dequantized int8 tier
    chunk = (1 << 22) if graph.num_nodes > (30 << 20) else None
    return neighborhood_labels(graph, x, 47, seed=3, chunk_rows=chunk)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=23, help="2^scale vertices")
    p.add_argument("--edge-factor", type=int, default=8)
    p.add_argument("--feat", type=int, default=600)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=6000)
    p.add_argument("--cache-frac", type=float, default=0.0,
                   help="0 = auto-size from HBM budget")
    p.add_argument("--bf16", action="store_true",
                   help="alias for --cache-dtype bfloat16")
    p.add_argument("--cache-dtype", default=None,
                   choices=["float32", "bfloat16", "int8"],
                   help="feature tier dtype; int8 quarters feature HBM "
                        "(the rmat25-on-one-chip enabler)")
    p.add_argument("--host-dtype", default="float32",
                   choices=["float32", "int8"],
                   help="host-DRAM tier dtype: int8 generates pre-quantized "
                        "features (scale 1/127) and builds the quantized "
                        "store — 4x less host DRAM and 4x fewer miss-path "
                        "bytes (the rmat27/papers100M enabler)")
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--paired", action="store_true",
                   help="paired row-gather draws (adds the [E/8,8] row "
                        "table to HBM: +E*4 bytes)")
    p.add_argument("--on-device", action="store_true",
                   help="in-HBM regime instead: whole-epoch on-device "
                        "training (use with --feat small enough to cache)")
    p.add_argument("--multihost", action="store_true",
                   help="spawn --procs controller processes x 2 virtual "
                        "CPU devices: edge-partitioned mode (partition CSR "
                        "per chip, features sharded across the mesh), each "
                        "process's DRAM holding only ITS chips' feature "
                        "rows via a memmap-backed store (config #5 shape)")
    p.add_argument("--procs", type=int, default=2,
                   help="controller processes for --multihost (2 devices "
                        "each)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args()

    args.cache_dtype = args.cache_dtype or (
        "bfloat16" if args.bf16 else "float32")
    if args.multihost:
        return _multihost_parent(args)

    from pagraph_tpu.utils.platform import (
        enable_compilation_cache,
        tune_host_allocator,
    )

    t0 = time.time()
    tune_host_allocator(4 << 30)
    enable_compilation_cache()
    if args.worker:
        # virtual CPU devices + jax.distributed BEFORE any backend use
        import os as _os
        flags = _os.environ.get("XLA_FLAGS", "")
        _os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
        from pagraph_tpu.parallel.multihost import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    if args.on_device:
        from pagraph_tpu.utils.platform import use_fast_prng
        use_fast_prng()
    log(f"[scale] allocator+cache ready in {time.time()-t0:.0f}s")

    import pagraph_tpu as pg
    from pagraph_tpu.data.formats import Dataset
    from pagraph_tpu.data.synthetic import (random_split_masks, rmat_coo,
                                            rmat_csr)
    from pagraph_tpu.graph import CSRGraph
    from pagraph_tpu.train.loop import Trainer

    from pagraph_tpu.utils.platform import parallel_random

    timings = {}
    if args.host_dtype == "int8":
        # papers100M-magnitude path: native generation straight to CSR,
        # pre-quantized int8 host tier, chunked teacher labels.  Nothing is
        # persisted (native regen is minutes; this disk writes ~10 MB/s).
        from pagraph_tpu.data.synthetic import neighborhood_labels  # noqa
        from pagraph_tpu.sampling.native import random_i8_native
        from pagraph_tpu.storage.feature_store import build_prequantized

        t0 = time.time()
        graph = rmat_csr(args.scale, args.edge_factor, seed=1,
                         backend="native")
        n = graph.num_nodes
        timings["gen_csr_s"] = round(time.time() - t0, 1)
        log(f"[scale] native gen+csr {timings['gen_csr_s']}s: "
            f"{n:,} v, {graph.num_edges:,} e")
        t0 = time.time()
        feats = random_i8_native((n, args.feat), seed=3)
        labels = _teacher_labels(graph, feats, dims=16)
        timings["features_labels_s"] = round(time.time() - t0, 1)
        log(f"[scale] int8 features {feats.nbytes/1e9:.1f} GB + teacher "
            f"labels in {timings['features_labels_s']}s")
        t0 = time.time()
        store = build_prequantized(graph, feats, 1.0 / 127.0)
        timings["store_build_s"] = round(time.time() - t0, 1)
        train, val, test = random_split_masks(n, train_frac=0.1, seed=4)
        return _run_trainer(args, pg, Trainer, graph, store, feats, labels,
                            train, timings)

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
            # usually costs more than regenerating (~12 min in RAM).
            # labels MUST be persisted with the features: recomputing them
            # against a memmapped feat.npy faults in every page
            labels = _teacher_labels(graph, feats)
            os.makedirs(cache_dir, exist_ok=True)
            for nm, arr in [("indptr", graph.indptr),
                            ("indices", graph.indices),
                            ("out_degrees", graph.out_degrees),
                            ("feat", feats), ("labels_nbr", labels)]:
                np.save(os.path.join(cache_dir, nm + ".npy"), arr)
            open(os.path.join(cache_dir, "ok"), "w").write("ok")
    # teacher labels cache under a NEW name: a round-2 cache dir holds
    # structure-FREE labels under labels.npy — loading those would silently
    # reintroduce the provenance bug this task fixes (VERDICT r2 #1)
    lab_path = os.path.join(cache_dir, "labels_nbr.npy")
    if os.path.exists(lab_path):
        # persisted by the generator: computing labels from the memmapped
        # features here would fault in EVERY page of feat.npy in every
        # worker, defeating the sharded-residency claim
        labels = np.load(lab_path)
    else:
        labels = _teacher_labels(graph, feats)
        if os.path.isdir(cache_dir):
            np.save(lab_path, labels)
    train, val, test = random_split_masks(n, train_frac=0.1, seed=4)
    ds = Dataset(graph, feats, labels, train, val, test)
    feat_gb = feats.nbytes / 1e9
    log(f"[scale] graph ready in {time.time()-t0:.0f}s: {n:,} vertices, "
        f"{graph.num_edges:,} edges, features {feat_gb:.1f} GB")

    if args.worker:
        return _worker_edge_train(args, pg, ds, n, feat_gb)

    cfg = pg.Config(
        model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16,
                             feat_dim=args.feat, n_classes=47),
        sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                 num_hops=2, prefetch=3,
                                 paired_draws=args.paired),
        cache=pg.CacheConfig(
            capacity=(int(n * args.cache_frac) if args.cache_frac else None),
            dtype=args.cache_dtype,
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
                        f"feat {feat_gb:.1f}GB {args.cache_dtype} "
                        f"{'on-device' if args.on_device else 'host tier'}"
                        f"{' paired' if args.paired else ''})",
            "cache_capacity_vertices": tr.cache.capacity,
            "cache_frac": round(tr.cache.capacity / n, 3),
            "hit_rate": round(1.0 - tr.epoch_metrics[-1].miss_rate, 4),
            "epoch_time_s": round(float(np.mean([m.time_s for m in steady])), 2),
        },
    }
    print(json.dumps(out), flush=True)


def _run_trainer(args, pg, Trainer, graph, store, feats, labels, train_mask,
                 timings):
    """Single-chip beyond-HBM training over a prebuilt (possibly
    pre-quantized) store, with phase timings and a host/HBM memory audit
    (the config-#5 'papers100M single chip' realization)."""
    n = graph.num_nodes
    train_nids = np.nonzero(train_mask)[0]
    cfg = pg.Config(
        model=pg.ModelConfig(arch="graphsage", n_layers=1,
                             hidden=args.hidden, feat_dim=args.feat,
                             n_classes=47),
        sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                 num_hops=2, prefetch=3,
                                 paired_draws=args.paired),
        cache=pg.CacheConfig(
            capacity=(int(n * args.cache_frac) if args.cache_frac else None),
            dtype=args.cache_dtype,
        ),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                             on_device_sampling=args.on_device),
    )
    t0 = time.time()
    tr = Trainer(cfg, store, graph, train_nids, labels, seed=0, log=True)
    timings["trainer_build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    tr.train(args.epochs)
    timings["train_s"] = round(time.time() - t0, 1)
    steady = tr.epoch_metrics[1:] or tr.epoch_metrics
    eps = float(np.mean([m.edges / m.time_s for m in steady]))
    host_bytes = (sum(f.nbytes for f in store.fields.values())
                  + graph.indptr.nbytes + graph.indices.nbytes
                  + graph.out_degrees.nbytes + labels.nbytes)
    row_bytes = tr.cache.padded_dim * tr.cache.np_dtype.itemsize
    audit = {
        "host_dram_bytes": int(host_bytes),
        "host_feature_dtype": str(store.fields["features"].dtype),
        "hbm_cache_bytes": int(tr.cache.capacity * row_bytes),
        "hbm_cache_map_bytes": int(4 * n),
        "f32_equivalent_host_feature_bytes": int(n * args.feat * 4),
    }
    out = {
        "metric": "edges_per_s_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "detail": {
            "workload": f"graphsage rmat{args.scale}x{args.edge_factor} "
                        f"({n:,} v, {graph.num_edges:,} e, "
                        f"feat {args.feat} host={args.host_dtype} "
                        f"cache={args.cache_dtype} "
                        f"{'on-device' if args.on_device else 'host tier'}"
                        f"{' paired' if args.paired else ''})",
            "cache_capacity_vertices": tr.cache.capacity,
            "cache_frac": round(tr.cache.capacity / n, 3),
            "hit_rate": round(1.0 - tr.epoch_metrics[-1].miss_rate, 4),
            "epoch_time_s": round(
                float(np.mean([m.time_s for m in steady])), 2),
            "epoch_times_s": [round(m.time_s, 2) for m in tr.epoch_metrics],
            "final_loss": round(tr.epoch_metrics[-1].mean_loss, 4),
            "timings": timings,
            "memory_audit": audit,
        },
    }
    print(json.dumps(out), flush=True)


def _worker_edge_train(args, pg, ds, n, feat_gb):
    """One controller process of the multihost demo: edge-partitioned
    on-device training (partition CSR per chip, features sharded across the
    global mesh; this process's DRAM gathers only its chips' rows from the
    memmap-backed store)."""
    import jax

    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh

    D = 2 * args.num_processes
    cfg = pg.Config(
        model=pg.ModelConfig(arch="graphsage", n_layers=1, hidden=16,
                             feat_dim=args.feat, n_classes=47),
        sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                 num_hops=2),
        partition=pg.PartitionConfig(num_parts=D, method="hash", num_hops=2),
        cache=pg.CacheConfig(dtype=getattr(args, "cache_dtype", None)
                             or ("bfloat16" if args.bf16 else "float32")),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                             on_device_sampling=True),
    )
    tr = DataParallelTrainer.from_dataset(
        cfg, ds, mesh=make_mesh(D), seed=0,
        log=args.process_id == 0, feature_source="edge")
    tr.train(args.epochs)
    if args.process_id != 0:
        return
    steady = tr.epoch_metrics[1:] or tr.epoch_metrics
    eps = float(np.mean([m.edges / m.time_s for m in steady]))
    itemsize = 2 if args.bf16 else 4
    per_proc_rows = tr._shard_rows * 2            # 2 local devices
    out = {
        "metric": "edges_per_s_total",
        "value": round(eps, 1),
        "unit": "edges/s",
        "detail": {
            "workload": f"graphsage rmat{args.scale} edge-partitioned "
                        f"({n:,} v, {ds.graph.num_edges:,} e, "
                        f"feat {feat_gb:.1f}GB total, "
                        f"{args.num_processes} procs x 2 devices)",
            "epoch_time_s": round(
                float(np.mean([m.time_s for m in steady])), 2),
            "halo_drops": int(tr.halo_drops),
            "feat_bytes_per_process": int(
                per_proc_rows * tr._feat_shards.shape[-1] * itemsize),
            "feat_bytes_total": int(ds.features.size * 4),
            "final_loss": tr.epoch_metrics[-1].mean_loss,
        },
    }
    print(json.dumps(out), flush=True)


def _multihost_parent(args):
    """Spawn the 2-process edge-partitioned demo and forward proc 0's JSON.
    Generates + persists the dataset once so workers memmap it (each
    process then faults in ONLY the feature pages its chips own)."""
    import subprocess
    import tempfile

    cache_dir = os.path.expanduser(
        f"~/.cache/pagraph_tpu_bench/scale{args.scale}_{args.feat}")
    if not os.path.exists(os.path.join(cache_dir, "ok")):
        # pure-numpy generation (no jax backend touched): workers memmap
        # these files and fault in only the pages their chips own
        log("[scale] generating + persisting dataset for memmap workers...")
        from pagraph_tpu.data.synthetic import rmat_coo
        from pagraph_tpu.graph import CSRGraph
        from pagraph_tpu.utils.platform import parallel_random

        t0 = time.time()
        graph = CSRGraph.from_coo(rmat_coo(args.scale, args.edge_factor,
                                           seed=1))
        feats = parallel_random((graph.num_nodes, args.feat), seed=3)
        labels = _teacher_labels(graph, feats)
        os.makedirs(cache_dir, exist_ok=True)
        for nm, arr in [("indptr", graph.indptr),
                        ("indices", graph.indices),
                        ("out_degrees", graph.out_degrees),
                        ("feat", feats), ("labels_nbr", labels)]:
            np.save(os.path.join(cache_dir, nm + ".npy"), arr)
        open(os.path.join(cache_dir, "ok"), "w").write("ok")
        log(f"[scale] dataset persisted in {time.time()-t0:.0f}s")
        del graph, feats
    from pagraph_tpu.parallel.multihost import spawn_local

    P = args.procs
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"p{i}.json") for i in range(P)]
        codes = spawn_local(
            [os.path.abspath(__file__), "--worker",
             "--scale", str(args.scale), "--feat", str(args.feat),
             "--edge-factor", str(args.edge_factor),
             "--epochs", str(args.epochs),
             "--batch-size", str(args.batch_size)]
            + (["--bf16"] if args.bf16 else []),
            P, timeout=1800, stdout_paths=outs)
        if codes != [0] * P:
            raise SystemExit(f"worker exit codes {codes}")
        line = open(outs[0]).read().strip().splitlines()[-1]
    print(line, flush=True)


if __name__ == "__main__":
    main()
