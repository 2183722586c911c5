"""Config-#5 scale rehearsal: rmat24+ (>=0.5B edges) through partition ->
edge-partitioned training, with a per-chip memory audit (VERDICT r2 #3/#4).

Exercises the machinery that has only ever run at smoke scale: the native
dg stream at millions of train vertices, int64 host CSR -> int32 per-chip
seams, the pad-to-max_e stacking under real dg skew, and the cyclic feature
shards.  Topology is the reference's own headline shape (2-layer model with
layer-0 preprocess, partition --num-hops 1 — README.md:115-117): a 2-hop
closure of a power-law graph at this scale IS the whole graph, which is why
the reference defaults to 1 hop too.

    python benchmarks/scale_rehearsal.py [--scale 24] [--edge-factor 32]
        [--feat 64] [--parts 8] [--epochs 2] [--method dg|hash]

Runs on 8 virtual CPU devices (no TPU needed; CPU-mesh throughput is
structural, not a perf claim).  Prints ONE JSON line with the wall-clock of
every phase, the skew table, and per-chip actual-vs-claimed bytes.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=24)
    p.add_argument("--edge-factor", type=int, default=32)
    p.add_argument("--feat", type=int, default=64)
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=6000)
    p.add_argument("--train-frac", type=float, default=0.1)
    p.add_argument("--method", default="dg", choices=["dg", "hash"])
    p.add_argument("--edge-balance", action="store_true",
                   help="dg: balance partition edge footprints (in_deg+1 "
                        "weights) — the skew mitigation under audit here")
    p.add_argument("--data-dir", default=None,
                   help="existing dataset cache dir (indptr/indices/"
                        "out_degrees/feat/labels_nbr .npy + ok marker) to "
                        "reuse instead of the per-recipe cache — e.g. "
                        "scale_demo's scale25_64")
    p.add_argument("--hops", type=int, default=1,
                   help="partition closure depth == sampled hops (model "
                        "gets hops+1 GNN layers under preprocess). hops=2 "
                        "at power-law scale makes every closure ~the whole "
                        "graph — the audit shows WHY the reference "
                        "defaults to 1 hop + preprocess")
    p.add_argument("--host-dtype", default="float32",
                   choices=["float32", "int8"],
                   help="int8: native gen straight to CSR, pre-quantized "
                        "int8 store (features AND the preprocess neigh "
                        "field via the chunked int8 SpMM), int8 feature "
                        "shards — the rmat27/papers100M-magnitude path")
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{args.parts}").strip()
    from pagraph_tpu.utils.platform import tune_host_allocator
    tune_host_allocator(8 << 30)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import pagraph_tpu as pg
    from pagraph_tpu.data.formats import Dataset
    from pagraph_tpu.data.synthetic import random_split_masks, rmat_coo
    from pagraph_tpu.graph import CSRGraph
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    from pagraph_tpu.partition import dg_partition, hash_partition
    from pagraph_tpu.partition.utils import partition_stats
    from pagraph_tpu.utils.platform import parallel_random

    timings = {}

    if args.host_dtype == "int8":
        from pagraph_tpu.data.synthetic import rmat_csr
        from pagraph_tpu.sampling.native import random_i8_native

        t0 = time.time()
        graph = rmat_csr(args.scale, args.edge_factor, seed=11,
                         backend="native")
        n, e = graph.num_nodes, graph.num_edges
        timings["gen_csr_s"] = round(time.time() - t0, 1)
        log(f"[rehearsal] native gen+csr {timings['gen_csr_s']}s: "
            f"{n:,} v, {e:,} e")
        t0 = time.time()
        feats = random_i8_native((n, args.feat), seed=13)
        from benchmarks.scale_demo import _teacher_labels
        labels = _teacher_labels(graph, feats, dims=16)
        timings["features_labels_s"] = round(time.time() - t0, 1)
        log(f"[rehearsal] int8 features {feats.nbytes/1e9:.1f} GB + labels "
            f"in {timings['features_labels_s']}s")
        train, val, test = random_split_masks(n, train_frac=args.train_frac,
                                              seed=14)
        ds = Dataset(graph, feats, labels, train, val, test)
        del feats                      # ds holds the only reference now
        return _partition_and_train(args, ds, timings)

    cache_dir = args.data_dir or os.path.expanduser(
        f"~/.cache/pagraph_tpu_bench/rehearsal{args.scale}"
        f"x{args.edge_factor}_{args.feat}")
    t0 = time.time()
    if os.path.exists(os.path.join(cache_dir, "ok")):
        ld = lambda nm: np.load(os.path.join(cache_dir, nm + ".npy"))
        graph = CSRGraph(ld("indptr"), ld("indices"), ld("out_degrees"))
        feats, labels = ld("feat"), ld("labels_nbr")
        timings["rmat_gen_s"] = timings["csr_build_s"] = 0.0
        timings["cache_load_s"] = round(time.time() - t0, 1)
        n, e = graph.num_nodes, graph.num_edges
        log(f"[rehearsal] loaded cached graph in "
            f"{timings['cache_load_s']}s: {n:,} v, {e:,} e")
        t0 = time.time()
    else:
        coo = rmat_coo(args.scale, args.edge_factor, seed=11)
        timings["rmat_gen_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        graph = CSRGraph.from_coo(coo)
        del coo
        timings["csr_build_s"] = round(time.time() - t0, 1)
        n, e = graph.num_nodes, graph.num_edges
        log(f"[rehearsal] graph: {n:,} v, {e:,} e "
            f"(gen {timings['rmat_gen_s']}s, csr {timings['csr_build_s']}s)")
        t0 = time.time()
        feats = parallel_random((n, args.feat), seed=13)
        from benchmarks.scale_demo import _teacher_labels
        labels = _teacher_labels(graph, feats)
        os.makedirs(cache_dir, exist_ok=True)
        for nm, arr in [("indptr", graph.indptr),
                        ("indices", graph.indices),
                        ("out_degrees", graph.out_degrees),
                        ("feat", feats), ("labels_nbr", labels)]:
            np.save(os.path.join(cache_dir, nm + ".npy"), arr)
        open(os.path.join(cache_dir, "ok"), "w").write("ok")
    train, val, test = random_split_masks(n, train_frac=args.train_frac,
                                          seed=14)
    ds = Dataset(graph, feats, labels, train, val, test)
    timings["features_labels_s"] = round(time.time() - t0, 1)
    log(f"[rehearsal] features {feats.nbytes/1e9:.1f} GB, "
        f"{int(train.sum()):,} train ({timings['features_labels_s']}s)")
    return _partition_and_train(args, ds, timings)


def _partition_and_train(args, ds, timings):
    import pagraph_tpu as pg
    from pagraph_tpu.parallel import DataParallelTrainer, make_mesh
    from pagraph_tpu.partition import dg_partition, hash_partition
    from pagraph_tpu.partition.utils import partition_stats

    n, e = ds.num_nodes, ds.graph.num_edges
    # --- partition (the SURVEY §7 "dg scalability" hard part) --------------
    t0 = time.time()
    hops = args.hops     # reference headline: --num-hops 1 + preprocess
    if args.method == "dg":
        parts = dg_partition(ds.graph, ds.train_nids, ds.labels,
                             args.parts, hops,
                             edge_balance=args.edge_balance)
    else:
        parts = hash_partition(ds.graph, ds.train_nids, ds.labels,
                               args.parts, hops, seed=0)
    timings["partition_s"] = round(time.time() - t0, 1)
    from pagraph_tpu.utils.platform import trim_host_allocator
    trim_host_allocator()              # return partition-phase temporaries
    pstats = partition_stats(parts, n)
    e_parts = [int(p.graph.num_edges) for p in parts]
    skew = max(e_parts) / max(np.mean(e_parts), 1)
    log(f"[rehearsal] {args.method} partition in {timings['partition_s']}s: "
        f"edges/part {e_parts}, skew max/mean {skew:.2f}, "
        f"replication {pstats['replication_factor']:.2f}")

    # --- edge-mode trainer on the virtual mesh ------------------------------
    m = pg.ModelConfig(arch="graphsage", n_layers=hops, hidden=16,
                       feat_dim=args.feat, n_classes=47, preprocess=True)
    int8 = args.host_dtype == "int8"
    cfg = pg.Config(
        model=m,
        sampler=pg.SamplerConfig(batch_size=args.batch_size, fanout=2,
                                 num_hops=m.num_sampled_hops),
        partition=pg.PartitionConfig(num_parts=args.parts,
                                     method=args.method, num_hops=hops),
        cache=pg.CacheConfig(dtype="int8" if int8 else "bfloat16"),
        train=pg.TrainConfig(lr=1e-2, warmup_epochs=1,
                             on_device_sampling=True),
    )
    from pagraph_tpu.storage.feature_store import (FeatureStore,
                                                   build_prequantized)
    t0 = time.time()
    if int8:
        store = build_prequantized(ds.graph, ds.features, 1.0 / 127.0,
                                   preprocess="graphsage")
    else:
        store = FeatureStore.build(ds.graph, ds.features,
                                   preprocess="graphsage")
    timings["store_build_s"] = round(time.time() - t0, 1)
    log(f"[rehearsal] store (with preprocess SpMM) in "
        f"{timings['store_build_s']}s")
    trim_host_allocator()

    t0 = time.time()
    tr = DataParallelTrainer(
        cfg, store, parts, mesh=make_mesh(args.parts), seed=0, log=True,
        feature_source="edge", full_graph=ds.graph,
        full_train_nids=ds.train_nids, full_labels=ds.labels,
        full_val_mask=ds.val_mask, full_features=ds.features,
    )
    timings["trainer_build_s"] = round(time.time() - t0, 1)
    if int8:
        # edge-mode epochs read ONLY the device-resident shards + partition
        # CSRs; at rmat27 the host store (34 GB features+neigh) must go or
        # the CPU-mesh epoch working set OOMs the 125 GB box (the
        # first-attempt exit-137 this guards against)
        import gc
        for f in ("features", "neigh"):
            store.fields.pop(f, None)
        ds.features = None
        tr._full_features = None
        gc.collect()
        trim_host_allocator()

    # --- per-chip memory audit: actual vs the E/P + N*D/P claim ------------
    D = args.parts
    struct_actual = int(tr._dev_indptr.nbytes + tr._dev_indices.nbytes) // D
    struct_claim = int(4 * e / D + 4 * n / D)         # int32 E/P + indptr
    feat_actual = int(tr._feat_shards.nbytes) // D
    itemsize = tr._feat_shards.dtype.itemsize
    feat_claim = int(n * tr._feat_shards.shape[-1] * itemsize / D)
    k_struct = struct_actual / max(struct_claim, 1)
    audit = {
        "per_chip_struct_bytes": struct_actual,
        "claimed_struct_bytes_E_over_P": struct_claim,
        "struct_blowup_k": round(k_struct, 2),
        "per_chip_feat_bytes": feat_actual,
        "claimed_feat_bytes_ND_over_P": feat_claim,
        "edge_skew_max_over_mean": round(float(skew), 3),
        "replication_factor": round(pstats["replication_factor"], 3),
    }
    log(f"[rehearsal] per-chip struct {struct_actual/1e6:.0f} MB "
        f"(claim E/P+N/P = {struct_claim/1e6:.0f} MB, k={k_struct:.2f}); "
        f"feat {feat_actual/1e6:.0f} MB (claim {feat_claim/1e6:.0f} MB)")

    t0 = time.time()
    tr.train(args.epochs)
    timings["train_s"] = round(time.time() - t0, 1)
    steady = tr.epoch_metrics[1:] or tr.epoch_metrics
    eps = float(np.mean([mm.edges / mm.time_s for mm in steady]))

    out = {
        "metric": "edges_per_s_total",
        "value": round(eps, 1),
        "unit": "edges/s",
        "detail": {
            "workload": (
                f"graphsage-preprocess edge-mode rmat{args.scale}"
                f"x{args.edge_factor} ({n:,} v, {e:,} e, feat {args.feat} "
                f"host={args.host_dtype}, "
                f"{D} virtual CPU devices, {args.method} partition)"
            ),
            "epoch_time_s": round(
                float(np.mean([mm.time_s for mm in steady])), 2),
            "final_loss": round(tr.epoch_metrics[-1].mean_loss, 4),
            "halo_drops": int(tr.halo_drops),
            "edges_per_part": e_parts,
            "timings": timings,
            "memory_audit": audit,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
