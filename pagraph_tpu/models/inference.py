"""Full-graph layer-wise inference.

The reference evaluates by building a full-neighborhood NodeFlow over the
test set and running the ``*Infer`` model variants (reference:
examples/eval.py:20-46, model/gcn_nssc.py:103-164).  Two backends with
identical semantics:

  * ``host``: exact aggregation over ALL in-neighbors via a host scipy CSR
    SpMM (sum or max segment-reduce), dense linears on device in row chunks;
  * ``device``: the whole layer-wise propagation on the accelerator — the
    edge list lives in HBM and aggregation is a ``lax.scan`` of fixed-size
    edge chunks scatter-added (or -maxed) into the ``[N, D]`` accumulator,
    so eval needs no host SpMM and no per-layer H2D round trips.

Semantics match the reference Infer models:

  * GCN:  h_agg = (sum of neighbor h) * norm  (== full-neighborhood mean),
          then linear (+ concat-skip on the last hidden layer);
  * GraphSAGE: fc_self(h) + fc_neigh(agg(h)) with mean/gcn(sum)/pool(max).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as spsp

from ..config import ModelConfig
from ..graph import CSRGraph, gcn_norm
from .common import linear

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


def _lstm_full_aggregate(graph: CSRGraph, h, lstm_params,
                         row_budget: int = 1 << 22) -> np.ndarray:
    """Exact full-neighborhood LSTM aggregation (reference trains the lstm
    aggregator at graphsage_nssc.py:112-125; eval replays it over every
    in-neighbor).  Per vertex: run the LSTM over ALL in-neighbors in CSR
    order, take the final hidden state; zero-degree rows stay zero.

    TPU-shaped: vertices are bucketed by ceil-pow2 degree so each bucket is
    one statically shaped padded ``[rows, F]`` scan on device (reusing the
    training op :func:`pagraph_tpu.ops.aggregate.block_aggregate_lstm` via a
    synthetic Block) — at most log2(max_deg) compiled shapes.  Rows are
    chunked so the gathered [rows, F, D] message tensor stays within
    ``row_budget`` elements."""
    from ..ops.aggregate import block_aggregate_lstm
    from ..sampling.block import Block

    n = graph.num_nodes
    deg = np.diff(graph.indptr).astype(np.int64)
    hidden = int(np.asarray(lstm_params["w_hh"]).shape[0])
    out = np.zeros((n, hidden), dtype=np.float32)
    nz = np.nonzero(deg > 0)[0]
    if len(nz) == 0:
        return out
    h_dev = jnp.asarray(np.asarray(h, dtype=np.float32))
    p_dev = jax.tree.map(jnp.asarray, lstm_params)
    run = jax.jit(block_aggregate_lstm)
    D_in = int(np.asarray(h).shape[1])
    # bucket = next power of two >= degree
    buckets = 1 << np.ceil(np.log2(np.maximum(deg[nz], 1))).astype(np.int64)
    indptr = graph.indptr
    for F in np.unique(buckets):
        vs = nz[buckets == F]
        # the gathered [rows, F, D] message tensor is rows*F*D elements:
        # bound ALL of it by the budget, not just rows*F
        rows_max = max(1, int(row_budget // max(int(F) * D_in, 1)))
        for i in range(0, len(vs), rows_max):
            chunk = vs[i:i + rows_max]
            lens = deg[chunk]
            cols = np.arange(F, dtype=np.int64)[None, :]
            mask = cols < lens[:, None]
            flat = indptr[chunk][:, None] + np.minimum(cols, lens[:, None] - 1)
            idx = graph.indices[flat].astype(np.int32)
            blk = Block(
                neigh_pos=jnp.asarray(idx),
                neigh_mask=jnp.asarray(mask),
                self_pos=jnp.zeros(len(chunk), dtype=jnp.int32),
            )
            out[chunk] = np.asarray(run(h_dev, blk, p_dev))
    return out


@partial(jax.jit, static_argnames=("kind", "num_nodes"))
def _device_aggregate(src: jax.Array, dst: jax.Array, h: jax.Array,
                      kind: str, num_nodes: int) -> jax.Array:
    """Exact full-graph in-neighbor aggregation on device.

    ``src``/``dst`` are the padded edge list reshaped ``[chunks, chunk]``;
    padded slots carry ``dst == num_nodes`` and are dropped by the scatter.
    """
    D = h.shape[1]
    if kind == "max":
        init = jnp.full((num_nodes, D), -jnp.inf, dtype=h.dtype)
    else:
        init = jnp.zeros((num_nodes, D), dtype=h.dtype)

    def step(acc, xs):
        s, d = xs
        vals = jnp.take(h, s, axis=0)
        if kind == "max":
            acc = acc.at[d].max(vals, mode="drop")
        else:
            acc = acc.at[d].add(vals, mode="drop")
        return acc, None

    acc, _ = jax.lax.scan(step, init, (src, dst))
    if kind == "max":
        acc = jnp.where(jnp.isneginf(acc), 0.0, acc)   # zero-degree rows
    return acc


class _DeviceEdges:
    """HBM-resident padded edge list for chunked scatter aggregation."""

    def __init__(self, graph: CSRGraph, edge_chunk: int = 1 << 20):
        n, e = graph.num_nodes, graph.num_edges
        chunk = min(edge_chunk, max(e, 1))
        pad = (-e) % chunk
        src = np.concatenate([graph.indices,
                              np.zeros(pad, dtype=np.int32)])
        dst = np.concatenate([
            np.repeat(np.arange(n, dtype=np.int32),
                      np.diff(graph.indptr).astype(np.int64)),
            np.full(pad, n, dtype=np.int32),        # dropped by scatter
        ])
        chunks = len(src) // chunk
        self.src = jnp.asarray(src.reshape(chunks, chunk))
        self.dst = jnp.asarray(dst.reshape(chunks, chunk))
        self.num_nodes = n

    def aggregate(self, h: jax.Array, kind: str) -> jax.Array:
        return _device_aggregate(self.src, self.dst, h, kind, self.num_nodes)


def full_graph_logits(
    params: dict,
    cfg: ModelConfig,
    graph: CSRGraph,
    features: np.ndarray,
    *,
    batch_rows: int = 65536,
    backend: str = "host",            # host | device
    edge_chunk: int = 1 << 20,
) -> np.ndarray:
    """Logits for every vertex.

    ``backend='host'``: aggregation on host (scipy SpMM), linear layers on
    device in row batches.  ``backend='device'``: everything on the
    accelerator via chunked edge scatters (see ``_DeviceEdges``).
    """
    if backend == "device":
        return _full_graph_logits_device(params, cfg, graph, features,
                                         edge_chunk)
    adj = _adj_csr(graph)
    norm = gcn_norm(graph)
    nl = cfg.n_layers
    # the preprocess dense/pre layer consumes reference update slot 0
    # (gcn_nssc.py:80-100) - deeper updates shift by one global index
    off = 1 if cfg.preprocess else 0
    h = np.asarray(features, dtype=np.float32)

    def dev_linear(p, x):
        fn = jax.jit(lambda p, x: linear(p, x))
        outs = []
        for i in range(0, x.shape[0], batch_rows):
            outs.append(np.asarray(fn(p, jnp.asarray(x[i:i + batch_rows]))))
        return np.concatenate(outs, axis=0)

    # gcn_cv always concat-skips (its init_params makes the output weight
    # 2*hid wide unconditionally, models/gcn_cv.py) — ignore skip_connection
    skip = cfg.skip_connection or cfg.arch == "gcn_cv"

    def finish(out, gi):
        if gi == nl - 1 and skip:
            return np.concatenate([out, np.maximum(out, 0.0)], axis=1)
        if gi < nl:
            return np.maximum(out, 0.0)
        return out

    if cfg.arch in ("gcn", "gcn_cv"):
        # gcn_cv evaluates as a preprocess GCN: control-variate histories
        # vanish under exact full-neighborhood aggregation (the reference
        # replays cv checkpoints through GCNInfer, eval.py:33-46)
        if cfg.preprocess:
            # layer 0 was pre-aggregated server-side; recompute it exactly:
            # full-graph mean == the store's preagg field (feature_store.py)
            h = finish(dev_linear(params["dense"], (adj @ h) * norm[:, None]),
                       0)
        for li, p in enumerate(params["updates"]):
            # sum aggregate * dst norm == exact mean (GCNInfer semantics)
            h_agg = (adj @ h) * norm[:, None]
            h = finish(dev_linear(p, h_agg), li + off)
        return h
    if cfg.arch == "graphsage":
        if cfg.preprocess:
            # training's neigh field is the full-graph mean aggregate
            # (feature_store.py preprocess='graphsage')
            h_agg0 = (adj @ h) * norm[:, None]
            h = finish(dev_linear(params["pre"]["self"], h)
                       + dev_linear(params["pre"]["neigh"], h_agg0), 0)
        for li, p in enumerate(params["updates"]):
            if cfg.aggregator == "lstm":
                h_agg = _lstm_full_aggregate(graph, h, params["lstm"][li])
            else:
                kind = {"mean": "mean", "gcn": "sum",
                        "pool": "max"}[cfg.aggregator]
                h_agg = _aggregate(graph, adj, h, kind, norm)
            out = dev_linear(p["self"], h) + dev_linear(p["neigh"], h_agg)
            h = finish(out, li + off)
        return h
    if cfg.arch == "gin":
        for li, p in enumerate(params["updates"]):
            # exact full-neighborhood injective update (train sums over the
            # sampled fanout; see models/gin.py)
            pre = (1.0 + np.float32(p["eps"])) * h + adj @ h
            out = dev_linear(p["w2"],
                             np.maximum(dev_linear(p["w1"], pre), 0.0))
            if li == nl - 1 and cfg.skip_connection:
                h = np.concatenate([out, np.maximum(out, 0.0)], axis=1)
            elif li < nl:
                h = np.maximum(out, 0.0)
            else:
                h = out
        return h
    if cfg.arch == "gat":
        return _gat_full_graph_host(params, cfg, graph, h)
    raise NotImplementedError(f"full-graph inference for {cfg.arch}")


def _gat_full_graph_host(params: dict, cfg: ModelConfig, graph: CSRGraph,
                         h: np.ndarray) -> np.ndarray:
    """Exact full-neighborhood GAT: per-dst softmax over ALL in-edges plus
    the self-loop (training softmaxes over the sampled fanout; inference
    over the full neighborhood, mirroring the GCN train/infer split)."""
    def leaky(x):
        return np.where(x > 0, x, 0.2 * x)

    n = graph.num_nodes
    indptr, indices = graph.indptr, graph.indices
    dst_e = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    layers = params["layers"]
    last = len(layers) - 1
    for li, p in enumerate(layers):
        K = np.asarray(p["a_self"]).shape[0]
        z = (h @ np.asarray(p["w"])).reshape(n, K, -1)       # [N, K, H]
        att_s = np.einsum("nkh,kh->nk", z, np.asarray(p["a_self"]))
        att_n = np.einsum("nkh,kh->nk", z, np.asarray(p["a_neigh"]))
        e = leaky(att_s[dst_e] + att_n[indices])             # [E, K]
        e_self = leaky(att_s + att_n)                        # [N, K]
        m = e_self.copy()                                    # running max
        np.maximum.at(m, dst_e, e)
        w_e = np.exp(e - m[dst_e])
        w_s = np.exp(e_self - m)
        den = w_s.copy()
        np.add.at(den, dst_e, w_e)
        out = (w_s / den)[:, :, None] * z
        np.add.at(out, dst_e, (w_e / den[dst_e])[:, :, None] * z[indices])
        if li == last:
            h = out.mean(axis=1)
        else:
            o = out.reshape(n, -1)
            h = np.where(o > 0, o, np.expm1(np.minimum(o, 0.0)))  # elu
    return h


def _full_graph_logits_device(params: dict, cfg: ModelConfig,
                              graph: CSRGraph, features: np.ndarray,
                              edge_chunk: int) -> np.ndarray:
    edges = _DeviceEdges(graph, edge_chunk)
    norm = jnp.asarray(gcn_norm(graph))[:, None]
    nl = cfg.n_layers
    off = 1 if cfg.preprocess else 0
    h = jnp.asarray(np.asarray(features, dtype=np.float32))

    skip = cfg.skip_connection or cfg.arch == "gcn_cv"

    def finish(out, gi):
        if gi == nl - 1 and skip:
            return jnp.concatenate([out, ACT(out)], axis=1)
        if gi < nl:
            return ACT(out)
        return out

    if cfg.arch in ("gcn", "gcn_cv"):
        if cfg.preprocess:
            h = finish(linear(params["dense"],
                              edges.aggregate(h, "sum") * norm), 0)
        for li, p in enumerate(params["updates"]):
            h_agg = edges.aggregate(h, "sum") * norm    # exact mean
            h = finish(linear(p, h_agg), li + off)
        return np.asarray(h)
    if cfg.arch == "graphsage":
        if cfg.preprocess:
            h_agg0 = edges.aggregate(h, "sum") * norm
            h = finish(linear(params["pre"]["self"], h)
                       + linear(params["pre"]["neigh"], h_agg0), 0)
        for li, p in enumerate(params["updates"]):
            if cfg.aggregator == "lstm":
                h_agg = jnp.asarray(
                    _lstm_full_aggregate(graph, np.asarray(h),
                                         params["lstm"][li]))
            else:
                kind = {"mean": "mean", "gcn": "sum",
                        "pool": "max"}[cfg.aggregator]
                h_agg = edges.aggregate(h, "sum" if kind == "mean" else kind)
                if kind == "mean":
                    h_agg = h_agg * norm
            out = linear(p["self"], h) + linear(p["neigh"], h_agg)
            h = finish(out, li + off)
        return np.asarray(h)
    if cfg.arch == "gin":
        for li, p in enumerate(params["updates"]):
            pre = (1.0 + p["eps"]) * h + edges.aggregate(h, "sum")
            out = linear(p["w2"], ACT(linear(p["w1"], pre)))
            if li == nl - 1 and cfg.skip_connection:
                h = jnp.concatenate([out, ACT(out)], axis=1)
            elif li < nl:
                h = ACT(out)
            else:
                h = out
        return np.asarray(h)
    if cfg.arch == "gat":
        return _gat_full_graph_device(params, cfg, edges, features)
    raise NotImplementedError(f"device inference for {cfg.arch}")


@partial(jax.jit, static_argnames=("num_nodes",))
def _gat_device_layer(p: dict, h: jax.Array, src: jax.Array, dst: jax.Array,
                      num_nodes: int) -> jax.Array:
    """One exact full-neighborhood GAT layer via three chunked edge scans.

    Numerically identical to ``_gat_full_graph_host``: per-dst softmax over
    all in-edges plus the self-loop, computed streaming —
    (1) scatter-max of edge logits, (2) scatter-add of exp-shifted weights,
    (3) scatter-add of weighted neighbor messages.  Per-edge logits are
    recomputed in each scan (two tiny gathers) instead of materializing an
    [E, K] tensor in HBM.
    """
    n = num_nodes
    K = p["a_self"].shape[0]
    leaky = lambda x: jnp.where(x > 0, x, 0.2 * x)
    z = (h @ p["w"]).reshape(n, K, -1)                       # [N, K, H]
    att_s = jnp.einsum("nkh,kh->nk", z, p["a_self"])         # [N, K]
    att_n = jnp.einsum("nkh,kh->nk", z, p["a_neigh"])

    def edge_logits(s, d):
        # padded slots (d == n) clamp their gather; scatters drop them
        return leaky(jnp.take(att_s, d, axis=0) + jnp.take(att_n, s, axis=0))

    def max_step(m, xs):
        s, d = xs
        return m.at[d].max(edge_logits(s, d), mode="drop"), None

    e_self = leaky(att_s + att_n)                            # [N, K]
    m, _ = jax.lax.scan(max_step, e_self, (src, dst))

    def den_step(den, xs):
        s, d = xs
        w = jnp.exp(edge_logits(s, d) - jnp.take(m, d, axis=0))
        return den.at[d].add(w, mode="drop"), None

    w_self = jnp.exp(e_self - m)
    den, _ = jax.lax.scan(den_step, w_self, (src, dst))

    def msg_step(out, xs):
        s, d = xs
        w = jnp.exp(edge_logits(s, d) - jnp.take(m, d, axis=0))
        w = w / jnp.take(den, d, axis=0)
        return out.at[d].add(w[:, :, None] * jnp.take(z, s, axis=0),
                             mode="drop"), None

    out0 = (w_self / den)[:, :, None] * z
    out, _ = jax.lax.scan(msg_step, out0, (src, dst))
    return out                                               # [N, K, H]


def _gat_full_graph_device(params: dict, cfg: ModelConfig,
                           edges: "_DeviceEdges",
                           features: np.ndarray) -> np.ndarray:
    h = jnp.asarray(np.asarray(features, dtype=np.float32))
    layers = params["layers"]
    last = len(layers) - 1
    for li, p in enumerate(layers):
        out = _gat_device_layer(
            jax.tree.map(jnp.asarray, p), h, edges.src, edges.dst,
            edges.num_nodes)
        if li == last:
            h = out.mean(axis=1)
        else:
            o = out.reshape(edges.num_nodes, -1)
            h = jax.nn.elu(o)
    return np.asarray(h)


def evaluate(
    params: dict,
    cfg: ModelConfig,
    graph: CSRGraph,
    features: np.ndarray,
    labels: np.ndarray,
    mask: np.ndarray,
    *,
    backend: str = "host",
) -> float:
    """Accuracy over masked vertices (reference eval.py:36-46)."""
    logits = full_graph_logits(params, cfg, graph, features, backend=backend)
    pred = logits.argmax(axis=1)
    sel = np.asarray(mask, dtype=bool)
    return float((pred[sel] == labels[sel]).mean())
