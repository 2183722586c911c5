"""Full-graph layer-wise inference.

The reference evaluates by building a full-neighborhood NodeFlow over the
test set and running the ``*Infer`` model variants (reference:
examples/eval.py:20-46, model/gcn_nssc.py:103-164).  On TPU the natural
equivalent is dense layer-wise propagation: exact aggregation over ALL
in-neighbors via a host CSR SpMM (sum or max segment-reduce), dense
linears on device.  Semantics match the reference Infer models:

  * GCN:  h_agg = (sum of neighbor h) * norm  (== full-neighborhood mean),
          then linear (+ concat-skip on the last hidden layer);
  * GraphSAGE: fc_self(h) + fc_neigh(agg(h)) with mean/gcn(sum)/pool(max).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as spsp

from ..config import ModelConfig
from ..graph import CSRGraph, gcn_norm
from .common import concat_skip, linear

ACT = jax.nn.relu


def _adj_csr(graph: CSRGraph) -> spsp.csr_matrix:
    n = graph.num_nodes
    return spsp.csr_matrix(
        (np.ones(graph.num_edges, dtype=np.float32),
         graph.indices, graph.indptr),
        shape=(n, n),
    )


def _segment_max(graph: CSRGraph, h: np.ndarray) -> np.ndarray:
    """Row-wise max over in-neighbors (the 'pool' aggregator, full graph)."""
    out = np.zeros((graph.num_nodes, h.shape[1]), dtype=h.dtype)
    gathered = h[graph.indices]                        # [E, D]
    ptr = graph.indptr
    nonempty = np.diff(ptr) > 0
    # reduceat needs non-empty segments; compute on the dense edge list
    starts = ptr[:-1][nonempty]
    red = np.maximum.reduceat(gathered, starts, axis=0) if len(starts) else np.zeros((0, h.shape[1]), h.dtype)
    out[nonempty] = red
    return out


def _aggregate(graph: CSRGraph, adj, h: np.ndarray, kind: str,
               norm: Optional[np.ndarray]) -> np.ndarray:
    if kind == "mean":
        return (adj @ h) * gcn_norm(graph)[:, None]
    if kind == "sum":
        return adj @ h
    if kind == "max":
        return _segment_max(graph, h)
    raise ValueError(kind)


def full_graph_logits(
    params: dict,
    cfg: ModelConfig,
    graph: CSRGraph,
    features: np.ndarray,
    *,
    batch_rows: int = 65536,
) -> np.ndarray:
    """Logits for every vertex.  Aggregation on host (exact, sparse), linear
    layers on the default device in row batches."""
    if cfg.preprocess:
        raise NotImplementedError(
            "full-graph inference consumes raw features; run with a "
            "non-preprocess config (weights are compatible for gcn layers >0)"
        )
    adj = _adj_csr(graph)
    norm = gcn_norm(graph)
    nl = cfg.n_layers
    h = np.asarray(features, dtype=np.float32)

    def dev_linear(p, x):
        fn = jax.jit(lambda p, x: linear(p, x))
        outs = []
        for i in range(0, x.shape[0], batch_rows):
            outs.append(np.asarray(fn(p, jnp.asarray(x[i:i + batch_rows]))))
        return np.concatenate(outs, axis=0)

    if cfg.arch == "gcn":
        for li, p in enumerate(params["updates"]):
            # sum aggregate * dst norm == exact mean (GCNInfer semantics)
            h_agg = (adj @ h) * norm[:, None]
            h = dev_linear(p, h_agg)
            if li == nl - 1 and cfg.skip_connection:
                h = np.concatenate([h, np.maximum(h, 0.0)], axis=1)
            elif li < nl:
                h = np.maximum(h, 0.0)
        return h
    if cfg.arch == "graphsage":
        kind = {"mean": "mean", "gcn": "sum", "pool": "max"}[cfg.aggregator]
        for li, p in enumerate(params["updates"]):
            h_agg = _aggregate(graph, adj, h, kind, norm)
            out = dev_linear(p["self"], h) + dev_linear(p["neigh"], h_agg)
            if li == nl - 1 and cfg.skip_connection:
                h = np.concatenate([out, np.maximum(out, 0.0)], axis=1)
            elif li < nl:
                h = np.maximum(out, 0.0)
            else:
                h = out
        return h
    raise NotImplementedError(f"full-graph inference for {cfg.arch}")


def evaluate(
    params: dict,
    cfg: ModelConfig,
    graph: CSRGraph,
    features: np.ndarray,
    labels: np.ndarray,
    mask: np.ndarray,
) -> float:
    """Accuracy over masked vertices (reference eval.py:36-46)."""
    logits = full_graph_logits(params, cfg, graph, features)
    pred = logits.argmax(axis=1)
    sel = np.asarray(mask, dtype=bool)
    return float((pred[sel] == labels[sel]).mean())
