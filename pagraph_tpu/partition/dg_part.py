"""Computation-aware greedy partitioner ("dg" — the PaGraph algorithm).

Re-design of the reference's streaming greedy assignment
(reference: PaGraph/partition/dg.py:30-103, SoCC'20 §4.1).  For each train
vertex (streamed), score every partition

    score[p] = (1 + |N_hops(v) ∩ assigned_p|) * (avg - p_vnum[p]) / (r_vnum[p] + 1)

where ``assigned_p`` counts already-assigned train vertices, ``p_vnum`` the
partition's train count, ``r_vnum`` its redundant-closure size, and
``avg = train_frac * V / P`` the balance target (the reference hard-codes
train_frac=0.65, dg.py:54; here it is the actual train fraction).  Ties break
toward the smaller partition (dg.py:30-35).

Vectorized over partitions with a per-partition closure bitmap; the
per-vertex hop neighborhood is a bounded frontier expansion.  The reference's
pure-Python loop is O(train · P · |N|) with per-element branches; this runs
the same stream with O(|N|) numpy kernels per vertex (and a C++ path can slot
in later for papers100M-scale inputs).
"""
from __future__ import annotations

import subprocess
from typing import List, Optional

import numpy as np

from ..data.formats import PartitionArtifact
from ..graph import CSRGraph
from .utils import _all_in_neighbors, extract_partition


def _hop_neighbors(graph: CSRGraph, nid: int, hops: int) -> np.ndarray:
    """All vertices within ``hops`` in-steps of ``nid`` (excluding depth-0
    duplicates; matches reference ``in_neighbors_hop``, dg.py:18-27)."""
    frontier = np.array([nid], dtype=np.int64)
    seen = frontier
    for _ in range(hops):
        nbrs = np.unique(_all_in_neighbors(graph, frontier))
        frontier = np.setdiff1d(nbrs, seen, assume_unique=True)
        if len(frontier) == 0:
            break
        seen = np.union1d(seen, frontier)
    return np.setdiff1d(seen, np.array([nid]), assume_unique=True)


def dg_assign(
    graph: CSRGraph,
    train_nids: np.ndarray,
    num_parts: int,
    hops: int,
    *,
    train_frac: Optional[float] = None,
    backend: str = "auto",           # auto | numpy | native
    edge_balance: bool = False,
) -> np.ndarray:
    """Stream train vertices through the greedy scorer.

    Returns ``belongs``: partition id per train vertex (aligned with
    ``train_nids`` order).  ``backend="native"`` runs the identical stream
    in C++ (``native/pagraph_native.cpp`` ``pg_dg_assign``) — bit-identical
    output, needed at papers100M scale where the per-vertex numpy stream is
    the bottleneck (SURVEY.md §7 hard parts); ``auto`` prefers native and
    falls back to numpy if the toolchain is unavailable.

    ``edge_balance=True`` weights each train vertex by ``in_deg(v) + 1`` in
    the balance term (and sets ``avg`` to the mean per-partition WEIGHT), so
    the greedy stream balances each partition's future CSR edge footprint
    instead of its train-vertex count.  The edge-partitioned trainer pads
    every chip's structure to ``max_p(E_p)`` (dp_trainer
    ``_stack_partition_structure``), so edge skew is directly wasted HBM —
    hub-heavy graphs assign whole hubs to one partition under the vertex
    formula (VERDICT r2 #4).  The affinity (``com``) and redundancy
    (``r_vnum``) terms are unchanged from the reference formula (dg.py:54).
    """
    n = graph.num_nodes
    train_nids = np.asarray(train_nids, dtype=np.int64)
    weights = None
    if edge_balance:
        weights = (graph.in_degrees[train_nids].astype(np.float64) + 1.0)
        avg = float(weights.sum()) / num_parts
    else:
        if train_frac is None:
            train_frac = len(train_nids) / max(n, 1)
        avg = train_frac * n / num_parts

    if backend in ("auto", "native"):
        try:
            from ..sampling.native import dg_assign_native
        except ImportError:
            dg_assign_native = None
            if backend == "native":
                raise
        if dg_assign_native is not None:
            try:
                return dg_assign_native(graph, train_nids, num_parts, hops,
                                        avg, weights)
            # fall back only on toolchain problems (no g++, bad .so); data
            # errors (rc != 0 -> ValueError) must surface, not silently
            # rerun as an hours-long numpy stream
            except (OSError, subprocess.CalledProcessError):
                if backend == "native":
                    raise

    train_belongs = np.full(n, -1, dtype=np.int32)   # train vertex -> part
    in_closure = np.zeros((num_parts, n), dtype=bool)  # redundancy bitmap
    p_vnum = np.zeros(num_parts, dtype=np.float64)
    r_vnum = np.zeros(num_parts, dtype=np.int64)
    out = np.empty(len(train_nids), dtype=np.int32)

    for i, nid in enumerate(train_nids):
        neigh = _hop_neighbors(graph, int(nid), hops)
        # common already-assigned neighbors per partition (+1 like reference)
        if len(neigh):
            nb = train_belongs[neigh]
            nb = nb[nb >= 0]
            com = np.bincount(nb, minlength=num_parts).astype(np.float64) + 1.0
        else:
            com = np.ones(num_parts, dtype=np.float64)
        score = com * (avg - p_vnum) / (r_vnum + 1)
        best = score.max()
        tied = np.nonzero(score == best)[0]
        p = tied[np.argmin(p_vnum[tied])] if len(tied) > 1 else tied[0]
        out[i] = p
        train_belongs[nid] = p
        p_vnum[p] += weights[i] if weights is not None else 1.0
        members = np.append(neigh, nid)
        fresh = ~in_closure[p, members]
        in_closure[p, members] = True
        r_vnum[p] += int(fresh.sum())
    return out


def dg_partition(
    graph: CSRGraph,
    train_nids: np.ndarray,
    labels: np.ndarray,
    num_parts: int,
    hops: int,
    *,
    train_frac: Optional[float] = None,
    backend: str = "auto",
    edge_balance: bool = False,
) -> List[PartitionArtifact]:
    belongs = dg_assign(graph, train_nids, num_parts, hops,
                        train_frac=train_frac, backend=backend,
                        edge_balance=edge_balance)
    parts = []
    for p in range(num_parts):
        chunk = np.asarray(train_nids)[belongs == p]
        parts.append(extract_partition(graph, np.sort(chunk), labels, hops))
    return parts
