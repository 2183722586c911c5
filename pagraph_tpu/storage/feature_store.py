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
    """Named per-vertex arrays over the FULL graph id space.

    ``scales``: per-column symmetric dequant scales for int8-stored fields —
    the **pre-quantized host tier** (round 5): the field lives in DRAM as
    int8 (4x smaller than f32 at papers100M scale) and the cache-miss path
    gathers + ships the int8 rows directly (4x fewer H2D bytes over the
    tunnel); f32 consumers get ``row * scale`` transparently."""

    def __init__(self, fields: Dict[str, np.ndarray], *, native: bool = True,
                 scales: Optional[Dict[str, np.ndarray]] = None):
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
        self.scales: Dict[str, np.ndarray] = {}
        for name, sc in (scales or {}).items():
            if self.fields[name].dtype != np.int8:
                raise ValueError(f"scale given for non-int8 field {name!r}")
            sc = np.asarray(sc, dtype=np.float32).reshape(-1)
            if len(sc) != self.fields[name].shape[1]:
                raise ValueError(f"scale length mismatch for field {name!r}")
            self.scales[name] = sc
        for name, arr in self.fields.items():
            if arr.dtype == np.int8 and name not in self.scales:
                raise ValueError(f"int8 field {name!r} requires a dequant scale")
        self._native_gather = None
        self._native_gather_i8 = None
        if native:
            try:
                from ..sampling.native import gather_rows_f32, gather_rows_i8
                self._native_gather = gather_rows_f32
                self._native_gather_i8 = gather_rows_i8
            except Exception:
                self._native_gather = None

    def is_quantized(self, names: Sequence[str]) -> bool:
        """True iff every named field is stored int8 (with scales)."""
        return all(self.fields[n].dtype == np.int8 for n in names)

    def fused_scale(self, names: Sequence[str]) -> np.ndarray:
        """Concatenated per-column dequant scale across ``names`` (int8 tier)."""
        return np.concatenate([self.scales[n] for n in names])

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
               out: Optional[np.ndarray] = None,
               *, quantized: bool = False) -> np.ndarray:
        """Fused gather of ``names`` fields for ``nids`` -> [len(nids), total_dim].

        This is the hot miss path (the reference's ``get_feat_from_server``,
        get_data.py:106-117); a C++ gather kernel can be swapped in via
        ``pagraph_tpu.storage.native``.

        ``quantized=True`` (requires ``is_quantized(names)``) returns raw
        int8 rows — no dequantize, no f32 materialization: the int8-tier
        miss path.  Otherwise the result is f32, with int8 fields
        dequantized via their stored scales.
        """
        total = self.total_dim(names)
        if quantized:
            if not self.is_quantized(names):
                raise ValueError("quantized gather over non-int8 fields")
            if out is None:
                out = np.empty((len(nids), total), dtype=np.int8)
            at = 0
            for n in names:
                f = self.fields[n]
                d = f.shape[1]
                dst = out[:, at:at + d]
                if (self._native_gather_i8 is not None
                        and isinstance(f, np.ndarray) and f.flags.c_contiguous
                        and dst.flags.c_contiguous):
                    self._native_gather_i8(
                        f, np.ascontiguousarray(nids, np.int64), dst)
                else:
                    np.take(f, nids, axis=0, out=dst)
                at += d
            return out
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
            if f.dtype == np.int8:
                rows = np.take(f, nids, axis=0).astype(np.float32)
                rows *= self.scales[n][None, :]
                out[:, at:at + d] = rows
            else:
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


def quantize_store(store: FeatureStore, field_names: Optional[Sequence[str]] = None,
                   chunk: int = 1 << 20) -> FeatureStore:
    """Convert the named f32 fields (default: all multi-column fields) to the
    pre-quantized int8 tier: per-column symmetric ``maxabs/127`` scales, rows
    stored int8.  Chunked — memmap-friendly — and in a NEW store; unnamed
    fields (e.g. ``norm``) pass through unchanged."""
    if field_names is None:
        field_names = [n for n, f in store.fields.items()
                       if f.dtype == np.float32 and f.shape[1] > 1]
    fields, scales = dict(store.fields), dict(store.scales)
    for name in field_names:
        f = store.fields[name]
        maxabs = np.zeros(f.shape[1], dtype=np.float32)
        for at in range(0, f.shape[0], chunk):
            m = np.max(np.abs(f[at:at + chunk].astype(np.float32)), axis=0)
            np.maximum(maxabs, m, out=maxabs)
        scale = maxabs / 127.0
        scale[scale == 0.0] = 1.0
        q = np.empty(f.shape, dtype=np.int8)
        for at in range(0, f.shape[0], chunk):
            blk = np.rint(f[at:at + chunk].astype(np.float32) / scale[None, :])
            q[at:at + chunk] = np.clip(blk, -127, 127).astype(np.int8)
        fields[name], scales[name] = q, scale
    return FeatureStore(fields, scales=scales)


def build_prequantized(
    graph: CSRGraph,
    feats_i8: np.ndarray,
    feat_scale,
    *,
    preprocess: Optional[str] = None,   # None | 'gcn' | 'graphsage'
    chunk: int = 1 << 21,
) -> FeatureStore:
    """Serving store straight from int8 features — the papers100M-scale
    twin of :meth:`FeatureStore.build` that never materializes an [N, D]
    f32 matrix.  The preprocess field (reference pa_server.py:45-52) is
    computed by the chunked int8-input SpMM (``pg_spmm_mean_i8``: the
    per-column scale factors out of the neighbor sum, so the aggregate is
    exact) and re-quantized chunk by chunk with its own per-column scale."""
    from ..sampling.native import spmm_mean_i8_native

    feats_i8 = np.ascontiguousarray(feats_i8, dtype=np.int8)
    n, d = feats_i8.shape
    scale = np.broadcast_to(
        np.asarray(feat_scale, dtype=np.float32).reshape(-1), (d,)
    ).copy() if np.ndim(feat_scale) <= 1 else np.asarray(feat_scale)
    norm = gcn_norm(graph)

    def quantized_aggregate() -> tuple:
        maxabs = np.zeros(d, dtype=np.float32)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            agg = spmm_mean_i8_native(graph, feats_i8, scale, norm, lo, hi)
            np.maximum(maxabs, np.abs(agg).max(axis=0), out=maxabs)
        nscale = maxabs / 127.0
        nscale[nscale == 0.0] = 1.0
        q = np.empty((n, d), dtype=np.int8)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            agg = spmm_mean_i8_native(graph, feats_i8, scale, norm, lo, hi)
            agg /= nscale[None, :]
            np.rint(agg, out=agg)
            q[lo:hi] = np.clip(agg, -127, 127).astype(np.int8)
        return q, nscale

    fields: Dict[str, np.ndarray] = {}
    scales: Dict[str, np.ndarray] = {}
    if preprocess == "gcn":
        fields["features"], scales["features"] = quantized_aggregate()
    elif preprocess == "graphsage":
        fields["features"], scales["features"] = feats_i8, scale
        fields["neigh"], scales["neigh"] = quantized_aggregate()
    else:
        fields["features"], scales["features"] = feats_i8, scale
    fields["norm"] = norm
    return FeatureStore(fields, scales=scales)


def full_graph_mean_aggregate(graph: CSRGraph, features: np.ndarray,
                              *, backend: str = "auto") -> np.ndarray:
    """One-shot exact layer-0 aggregation over the FULL graph:
    ``(sum of in-neighbor features) * (1/in_degree)`` — the reference's
    ``update_all(copy_src, sum) * norm`` (pa_server.py:45-52).  Runs as a
    parallel C++ SpMM (``pg_spmm_mean_f32``) when the native toolchain is
    available (the store_build phase cost 76-158 s via single-threaded scipy
    at 0.5B edges, SCALE_r04), else a scipy CSR SpMM on the host."""
    if backend == "auto":
        try:
            from ..sampling.native import get_lib
            get_lib()
            backend = "native"
        except Exception:
            backend = "scipy"
    if backend == "native":
        from ..sampling.native import spmm_mean_native
        return spmm_mean_native(graph, np.asarray(features, dtype=np.float32),
                                gcn_norm(graph))
    import scipy.sparse as spsp

    n = graph.num_nodes
    adj = spsp.csr_matrix(
        (np.ones(graph.num_edges, dtype=np.float32), graph.indices, graph.indptr),
        shape=(n, n),
    )
    agg = adj @ np.asarray(features, dtype=np.float32)
    agg *= gcn_norm(graph)[:, None]
    return agg
