"""Host-DRAM feature store — the CPU tier of the two-level feature hierarchy.

TPU-native analog of the reference's shared-memory graph store
(``dgl.contrib.graph_store.create_graph_store_server`` /
``create_graph_from_store``; reference: server/pa_server.py:33-36,
examples/profile/pa_gcn.py:33, PaGraph/data/get_data.py:106-117).  On GPU the
store is a separate server process with C++ shared-memory frames; on TPU every
trainer process owns its host DRAM, so the store is simply named numpy arrays
(optionally ``np.memmap``-backed for datasets larger than RAM) with a fused
gather for the cache-miss path.

Fields follow the reference's store schema: ``features`` (raw or server-side
pre-aggregated), ``norm`` (1/in_degree), ``neigh`` (GraphSAGE preprocess
field) — reference: server/pa_server.py:43-61.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..graph import CSRGraph, gcn_norm


class FeatureStore:
    """Named per-vertex arrays over the FULL graph id space."""

    def __init__(self, fields: Dict[str, np.ndarray], *, native: bool = True):
        n = None
        self.fields: Dict[str, np.ndarray] = {}
        for name, arr in fields.items():
            if arr.ndim == 1:
                arr = arr[:, None]
            if n is None:
                n = arr.shape[0]
            elif arr.shape[0] != n:
                raise ValueError(f"field {name!r} has {arr.shape[0]} rows, expected {n}")
            self.fields[name] = arr
        self.num_nodes = n or 0
        self._native_gather = None
        if native:
            try:
                from ..sampling.native import gather_rows_f32
                self._native_gather = gather_rows_f32
            except Exception:
                self._native_gather = None

    def dim(self, name: str) -> int:
        return self.fields[name].shape[1]

    def total_dim(self, names: Sequence[str]) -> int:
        return sum(self.dim(n) for n in names)

    def field_offsets(self, names: Sequence[str]) -> Dict[str, slice]:
        offs, at = {}, 0
        for n in names:
            offs[n] = slice(at, at + self.dim(n))
            at += self.dim(n)
        return offs

    def gather(self, names: Sequence[str], nids: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
        """Fused gather of ``names`` fields for ``nids`` -> [len(nids), total_dim].

        This is the hot miss path (the reference's ``get_feat_from_server``,
        get_data.py:106-117); a C++ gather kernel can be swapped in via
        ``pagraph_tpu.storage.native``.
        """
        total = self.total_dim(names)
        if out is None:
            out = np.empty((len(nids), total), dtype=np.float32)
        use_native = (
            self._native_gather is not None
            and len(names) == 1
            and self.fields[names[0]].dtype == np.float32
            and isinstance(self.fields[names[0]], np.ndarray)
            and self.fields[names[0]].flags.c_contiguous
            and out.flags.c_contiguous
            and out.shape[1] == total
        )
        if use_native:
            self._native_gather(
                self.fields[names[0]], np.ascontiguousarray(nids, np.int64), out
            )
            return out
        at = 0
        for n in names:
            f = self.fields[n]
            d = f.shape[1]
            np.take(f, nids, axis=0, out=out[:, at:at + d])
            at += d
        return out

    @classmethod
    def build(
        cls,
        graph: CSRGraph,
        features: np.ndarray,
        *,
        preprocess: Optional[str] = None,   # None | 'gcn' | 'graphsage'
    ) -> "FeatureStore":
        """Build the serving fields the reference's server publishes
        (pa_server.py:43-61): always ``norm``; with preprocess, replace/extend
        features with the one-time full-graph aggregation (the hop-reduction
        trick, pa_server.py:45-52)."""
        fields: Dict[str, np.ndarray] = {}
        norm = gcn_norm(graph)
        if preprocess == "gcn":
            fields["features"] = full_graph_mean_aggregate(graph, features)
        elif preprocess == "graphsage":
            fields["features"] = np.asarray(features, dtype=np.float32)
            # The reference server stores an identity copy in 'neigh'
            # (pa_server.py:57-61); we compute the true mean aggregation —
            # the stated intent of the preprocess optimization.
            fields["neigh"] = full_graph_mean_aggregate(graph, features)
        else:
            fields["features"] = np.asarray(features, dtype=np.float32)
        fields["norm"] = norm
        return cls(fields)


def full_graph_mean_aggregate(graph: CSRGraph, features: np.ndarray) -> np.ndarray:
    """One-shot exact layer-0 aggregation over the FULL graph:
    ``(sum of in-neighbor features) * (1/in_degree)`` — the reference's
    ``update_all(copy_src, sum) * norm`` (pa_server.py:45-52).  Runs as a
    scipy CSR SpMM on the host (offline, once per dataset)."""
    import scipy.sparse as spsp

    n = graph.num_nodes
    adj = spsp.csr_matrix(
        (np.ones(graph.num_edges, dtype=np.float32), graph.indices, graph.indptr),
        shape=(n, n),
    )
    agg = adj @ np.asarray(features, dtype=np.float32)
    agg *= gcn_norm(graph)[:, None]
    return agg
