"""Hop-closure extraction for self-reliant partitions.

TPU-native analog of the reference's ``get_sub_graph``
(reference: PaGraph/partition/utils.py:9-52), which runs a one-batch
full-neighborhood DGL NeighborSampler to collect the closure.  Here the
closure is computed by vectorized frontier expansion over the host CSR.

Self-reliance invariant (the heart of PaGraph, SoCC'20 §4): the partition
contains every vertex within ``hops`` in-neighbor steps of its train
vertices, and every vertex at depth < hops keeps ALL its in-edges — so
``hops``-level neighbor sampling on the local subgraph is distributionally
identical to sampling on the full graph.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..data.formats import PartitionArtifact
from ..graph import CSRGraph


def _all_in_neighbors(graph: CSRGraph, nodes: np.ndarray) -> np.ndarray:
    """Concatenated in-neighbors of ``nodes`` (with duplicates)."""
    starts = graph.indptr[nodes]
    lens = (graph.indptr[nodes + 1] - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.repeat(starts, lens) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
    )
    return graph.indices[idx].astype(np.int64)


def _native_ok() -> bool:
    try:
        from ..sampling.native import get_lib
        get_lib()
        return True
    except Exception:
        return False


def hop_closure(graph: CSRGraph, seeds: np.ndarray, hops: int,
                *, backend: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
    """Return ``(closure_nodes, interior_nodes)``: all vertices within
    ``hops`` in-steps of ``seeds``, and those within ``hops - 1`` (the ones
    whose full in-edge lists must be retained).

    ``backend="native"`` runs the identical BFS as a C++ bitmap kernel
    (``pg_hop_closure``) — set-identical output (tests/test_native_pipeline),
    needed at 0.5B+ edges where this phase cost 2,112 s in numpy
    (SCALE_r04_hops2.json); ``auto`` prefers native."""
    if backend == "auto":
        backend = "native" if _native_ok() else "numpy"
    if backend == "native" and hops > 0:
        from ..sampling.native import hop_closure_native
        return hop_closure_native(graph, seeds, hops)
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    visited = seeds
    frontier = seeds
    interior = seeds
    for depth in range(hops):
        nbrs = np.unique(_all_in_neighbors(graph, frontier))
        frontier = np.setdiff1d(nbrs, visited, assume_unique=True)
        visited = np.union1d(visited, frontier)
        if depth < hops - 1:
            interior = visited
    return visited, interior


def extract_partition(
    graph: CSRGraph,
    train_nids: np.ndarray,
    labels: np.ndarray,
    hops: int,
    *,
    backend: str = "auto",
) -> PartitionArtifact:
    """Materialize one self-reliant partition: compact-relabel the closure,
    keeping all in-edges of interior (depth < hops) vertices.

    ``backend="native"`` runs the closure BFS, sub-CSR row fill, and
    out-degree histogram as parallel C++ kernels — bit-identical artifacts
    (tests/test_native_pipeline) at 0.5B+-edge scale."""
    if backend == "auto":
        backend = "native" if _native_ok() else "numpy"
    closure, interior = hop_closure(graph, train_nids, hops, backend=backend)
    sub2full = closure                           # sorted unique
    full2sub = np.full(graph.num_nodes, -1, dtype=np.int64)
    full2sub[sub2full] = np.arange(len(sub2full))

    interior_local = full2sub[interior]
    counts = np.zeros(len(sub2full), dtype=np.int64)
    lens = (graph.indptr[interior + 1] - graph.indptr[interior]).astype(np.int64)
    counts[interior_local] = lens
    indptr = np.zeros(len(sub2full) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    if backend == "native":
        from ..sampling.native import histogram_i32_native, map_rows_native
        indices = map_rows_native(
            graph, full2sub, interior, indptr[interior_local],
            int(lens.sum()))
        out_deg = histogram_i32_native(indices, len(sub2full))
    else:
        nbrs = _all_in_neighbors(graph, interior)
        indices = full2sub[nbrs].astype(np.int32)
        assert (indices >= 0).all(), \
            "closure must contain all interior in-neighbors"
        out_deg = np.bincount(indices, minlength=len(sub2full)).astype(np.int32)
    sub = CSRGraph(indptr=indptr, indices=indices, out_degrees=out_deg)
    local_train = full2sub[np.asarray(train_nids, dtype=np.int64)]
    return PartitionArtifact(
        graph=sub,
        train_nids=np.sort(local_train),
        local2full=sub2full,
        labels=np.asarray(labels, dtype=np.int64)[sub2full],
    )


def partition_stats(parts: List[PartitionArtifact], num_nodes: int) -> dict:
    """Replication factor etc. (reference prints per-partition vertex counts,
    dg.py:99-100)."""
    total_with_red = sum(p.num_nodes for p in parts)
    return {
        "num_parts": len(parts),
        "vertices_per_part": [p.num_nodes for p in parts],
        "train_per_part": [len(p.train_nids) for p in parts],
        "replication_factor": total_with_red / max(num_nodes, 1),
    }
