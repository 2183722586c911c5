"""Host-side graph structure.

The TPU-native analog of the reference's ``dgl.DGLGraph(coo_adj, readonly=True)``
(reference: server/pa_server.py:18) — but instead of a C++ graph object we keep a
plain CSR pair of numpy arrays on the host.  Sampling walks this structure on the
CPU; the device only ever sees fixed-shape padded index blocks (see
``pagraph_tpu.sampling.block``).

Orientation convention (matches the reference's ``edge_dir='in'`` store,
server/pa_server.py:33-36): ``indptr``/``indices`` index **in-neighbors** —
row ``v`` lists the sources of edges ``u -> v``.  GNN aggregation pulls messages
from in-neighbors; the feature cache ranks vertices by **out**-degree
(reference: PaGraph/storage/storage.py:90-104), which we precompute from the
same edge set.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as spsp


@dataclasses.dataclass
class CSRGraph:
    """In-neighbor CSR over a compact vertex id space [0, num_nodes)."""

    indptr: np.ndarray    # int64 [N+1]
    indices: np.ndarray   # int32 [E]  in-neighbor (source) ids
    out_degrees: np.ndarray  # int32 [N]

    def __post_init__(self):
        self.indptr = np.ascontiguousarray(self.indptr, dtype=np.int64)
        self.indices = np.ascontiguousarray(self.indices, dtype=np.int32)
        self.out_degrees = np.ascontiguousarray(self.out_degrees, dtype=np.int32)

    @property
    def num_nodes(self) -> int:
        return len(self.indptr) - 1

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    @property
    def in_degrees(self) -> np.ndarray:
        return np.diff(self.indptr).astype(np.int32)

    def in_neighbors(self, v: int) -> np.ndarray:
        return self.indices[self.indptr[v]:self.indptr[v + 1]]

    @classmethod
    def from_coo(
        cls,
        coo: spsp.spmatrix,
        *,
        dedup: bool = True,
    ) -> "CSRGraph":
        """Build from a scipy sparse adjacency where ``A[dst, src] != 0``.

        This matches the reference dataset contract: ``adj.npz`` holds a COO
        matrix whose rows are destinations and columns are sources (the
        reference feeds it straight to DGL with ``edge_dir='in'``).
        Duplicate edges are removed (reference: PaGraph/partition/utils.py:36-44
        dedups via COO->CSR round trip).
        """
        n = coo.shape[0]
        csr = coo.tocsr()
        if dedup:
            csr.sum_duplicates()
        csr.sort_indices()
        # out-degree: count of occurrences of each vertex as a source (column)
        out_deg = np.bincount(csr.indices, minlength=n).astype(np.int32)
        return cls(
            indptr=csr.indptr.astype(np.int64),
            indices=csr.indices.astype(np.int32),
            out_degrees=out_deg,
        )

    def to_coo(self) -> spsp.coo_matrix:
        n = self.num_nodes
        csr = spsp.csr_matrix(
            (np.ones(self.num_edges, dtype=np.float32), self.indices, self.indptr),
            shape=(n, n),
        )
        return csr.tocoo()

    def subgraph(self, nodes: np.ndarray) -> tuple["CSRGraph", np.ndarray]:
        """Node-induced subgraph with compact relabeling.

        Returns ``(sub, sub2full)`` where ``sub2full[i]`` is the full-graph id
        of local vertex ``i``.  Edges whose endpoint is outside ``nodes`` are
        dropped (the self-reliant partitioner guarantees closure so nothing of
        interest is lost; reference: PaGraph/partition/utils.py:9-52).
        """
        nodes = np.asarray(nodes, dtype=np.int64)
        sub2full = np.unique(nodes)
        full2sub = np.full(self.num_nodes, -1, dtype=np.int64)
        full2sub[sub2full] = np.arange(len(sub2full))
        # Vectorized: row-slice the CSR, then drop columns outside the node set.
        starts = self.indptr[sub2full]
        ends = self.indptr[sub2full + 1]
        row_lens = (ends - starts).astype(np.int64)
        total = int(row_lens.sum())
        # Gather all candidate in-neighbor edges for the selected rows.
        edge_idx = np.repeat(starts, row_lens) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(row_lens) - row_lens, row_lens)
        )
        cand = full2sub[self.indices[edge_idx]]
        keep = cand >= 0
        row_of_edge = np.repeat(np.arange(len(sub2full), dtype=np.int64), row_lens)
        kept_rows = row_of_edge[keep]
        indices = cand[keep].astype(np.int32)
        counts = np.bincount(kept_rows, minlength=len(sub2full)).astype(np.int64)
        indptr = np.zeros(len(sub2full) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        out_deg = np.bincount(indices, minlength=len(sub2full)).astype(np.int32)
        sub = CSRGraph(indptr=indptr, indices=indices, out_degrees=out_deg)
        return sub, sub2full


def gcn_norm(graph: CSRGraph, eps: float = 0.0) -> np.ndarray:
    """GCN normalization 1/in_degree (reference: server/pa_server.py:43)."""
    deg = graph.in_degrees.astype(np.float32)
    norm = 1.0 / np.maximum(deg, 1.0)
    norm[deg == 0] = eps
    return norm
