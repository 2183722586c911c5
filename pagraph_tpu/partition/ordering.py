"""Locality reordering: relabel vertices so high-degree hubs and their
neighborhoods are contiguous.

Implements the *intent* of the reference's ``reordering``
(reference: PaGraph/partition/ordering.py:21-54): visit vertices in
descending in-degree order; when a vertex is placed, immediately place its
unvisited in-neighbors next to it.  (The reference has an index bug at
ordering.py:40 — it tests ``vmap[nid]`` instead of ``vmap[vnei]`` — which
silently degenerates it to a plain degree sort; SURVEY.md "bugs not to
replicate".  This is the fixed behavior, with ``cluster=False`` reproducing
the degenerate pure degree sort if ever needed for comparison.)
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as spsp

from ..data.formats import Dataset
from ..graph import CSRGraph


def reorder_map(graph: CSRGraph, *, cluster: bool = True) -> np.ndarray:
    """Return ``vmap``: old id -> new id."""
    n = graph.num_nodes
    order = np.argsort(-graph.in_degrees, kind="stable")
    vmap = np.full(n, -1, dtype=np.int64)
    if not cluster:
        vmap[order] = np.arange(n)
        return vmap
    nxt = 0
    for v in order:
        if vmap[v] == -1:
            vmap[v] = nxt
            nxt += 1
        for u in graph.in_neighbors(v):
            if vmap[u] == -1:
                vmap[u] = nxt
                nxt += 1
    return vmap


def apply_reordering(ds: Dataset, vmap: np.ndarray) -> Dataset:
    """Relabel a whole dataset (the reference rewrites its files in place,
    dg.py:126-138; we return a new Dataset)."""
    n = ds.graph.num_nodes
    inv = np.empty(n, dtype=np.int64)      # new id -> old id
    inv[vmap] = np.arange(n)
    coo = ds.graph.to_coo()
    new_coo = spsp.coo_matrix(
        (coo.data, (vmap[coo.row], vmap[coo.col])), shape=(n, n)
    )
    return Dataset(
        graph=CSRGraph.from_coo(new_coo),
        features=np.asarray(ds.features)[inv],
        labels=ds.labels[inv],
        train_mask=ds.train_mask[inv],
        val_mask=ds.val_mask[inv],
        test_mask=ds.test_mask[inv],
    )
