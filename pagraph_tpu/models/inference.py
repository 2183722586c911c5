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


@partial(jax.jit, static_argnames=("kind",))
def _window_reduce(h_pad, idx, kind: str):
    """Reduce padded neighbor windows: ``idx`` int32 [nchunks, rows, F]
    indexes ``h_pad`` [S+1, D] whose LAST row is the zero pad target; pad
    slots carry index S.  Scans chunks so only one [rows, F, D] gather is
    live at a time.  Returns [nchunks*rows, D].

    ``max`` maps all-(-inf) reductions to 0, so a vertex whose real
    neighbor rows are all -inf is indistinguishable from zero-degree
    padding — same convention as `_device_aggregate` (parity with the
    retained `_DeviceEdges` path)."""
    pad_id = h_pad.shape[0] - 1

    def step(carry, ix):
        vals = jnp.take(h_pad, ix, axis=0)            # [rows, F, D]
        if kind == "max":
            m = (ix != pad_id)[..., None]
            red = jnp.max(jnp.where(m, vals, -jnp.inf), axis=1)
            red = jnp.where(jnp.isneginf(red), jnp.zeros((), vals.dtype),
                            red)                       # zero-degree rows
        else:
            red = jnp.sum(vals, axis=1)
        return carry, red

    _, outs = jax.lax.scan(step, 0, idx)
    return outs.reshape(-1, h_pad.shape[1])


def _chunk_rows(idx2d: np.ndarray, n_pad: int, rows_c: int) -> np.ndarray:
    """[rows, F] -> [nchunks, rows_c, F], padding extra rows with n_pad."""
    rows, F = idx2d.shape
    nc = max(1, -(-rows // rows_c))
    out = np.full((nc * rows_c, F), n_pad, dtype=np.int32)
    out[:rows] = idx2d
    return out.reshape(nc, rows_c, F)


class _BucketedNeighborhoods:
    """Degree-bucketed padded neighbor windows: exact full-graph
    aggregation as pure gathers + dense reductions — NO scatter.

    XLA's TPU scatter-add serializes per index: a single 16.1M-edge
    ``acc.at[dst].add(h[src])`` sum at D=256 measured 15-30 s on v5e
    (~1 us/edge), while the equivalent gather runs 69M edges/s (measured
    2026-08-20, BENCH_NOTES "scatter-free device inference").  So instead
    of scattering messages to destinations, each destination GATHERS a
    statically shaped padded window of its in-neighbor rows:

    - vertices are grouped by ceil-pow2 in-degree (F = f_min..f_cap
      columns, <= ~10 buckets); each bucket is one [nchunks, rows, F]
      int32 window table, pad slots = sentinel ``n`` (``h`` gets one
      appended zero row, so pads add 0 to sums and are masked for max);
    - hubs (deg > f_cap) split into ceil(deg/f_cap) windows whose
      per-window partials are reduced by a tiny second-level table;
    - per-bucket results concatenate in grouped order and un-permute
      with ONE n-row gather.

    Build once per graph (layer/dtype independent, ~2E int32 of HBM);
    each ``aggregate`` is ~a dozen dispatches.  The reference's analog is
    DGL's CPU/GPU SpMM (reference: examples/eval.py:28-46 evaluates via
    full-graph DGLGraph.update_all).
    """

    def __init__(self, graph: CSRGraph, f_min: int = 8, f_cap: int = 4096,
                 chunk_elems: int = 1 << 26, d_max: int = 512):
        n = graph.num_nodes
        self.num_nodes = n
        deg = np.diff(graph.indptr).astype(np.int64)
        indptr, indices = graph.indptr, graph.indices
        perm_parts = []
        zero = np.nonzero(deg == 0)[0]
        perm_parts.append(zero)
        self._n0 = len(zero)
        self._buckets = []
        small = np.nonzero((deg > 0) & (deg <= f_cap))[0]
        if len(small):
            Fs = np.maximum(
                f_min,
                (1 << np.ceil(np.log2(deg[small])).astype(np.int64)))
            for F in np.unique(Fs):
                vs = small[Fs == F]
                perm_parts.append(vs)
                cols = np.arange(F, dtype=np.int64)[None, :]
                mask = cols < deg[vs][:, None]
                flat = indptr[vs][:, None] + np.where(mask, cols, 0)
                idx = np.where(mask, indices[flat], n).astype(np.int32)
                rows_c = max(1, chunk_elems // (int(F) * d_max))
                self._buckets.append(
                    (jnp.asarray(_chunk_rows(idx, n, rows_c)), len(vs)))
        big = np.nonzero(deg > f_cap)[0]
        self._big = None
        if len(big):
            # Second level is bucketed by per-hub window count (same
            # ceil-pow2 scheme as level 1): one mega-hub (deg ~1e7 ->
            # ~4096 windows) must not inflate EVERY hub row to the global
            # max window count (ADVICE r3).  Hubs are reordered bucket-
            # grouped so outputs concatenate in perm order.
            wc_all = (-(-deg[big] // f_cap)).astype(np.int64)
            F2s = np.maximum(2, 1 << np.ceil(np.log2(wc_all)).astype(np.int64))
            order = np.argsort(F2s, kind="stable")
            big, wcounts, F2s = big[order], wc_all[order], F2s[order]
            perm_parts.append(big)
            W = int(wcounts.sum())
            widx = np.full((W, f_cap), n, dtype=np.int32)
            row = 0
            for v, wc in zip(big, wcounts):
                nb = indices[indptr[v]:indptr[v] + deg[v]]
                pad = int(wc) * f_cap - len(nb)
                widx[row:row + wc] = np.concatenate(
                    [nb, np.full(pad, n, nb.dtype)]).reshape(wc, f_cap)
                row += int(wc)
            rows_cw = max(1, chunk_elems // (f_cap * d_max))
            starts = np.concatenate([[0], np.cumsum(wcounts)[:-1]])
            lvl2 = []
            for F2 in np.unique(F2s):
                sel = F2s == F2
                cols2 = np.arange(F2, dtype=np.int64)[None, :]
                m2 = cols2 < wcounts[sel][:, None]
                idx2 = np.where(m2, starts[sel][:, None] + cols2,
                                W).astype(np.int32)
                rows_c2 = max(1, chunk_elems // (int(F2) * d_max))
                lvl2.append((jnp.asarray(_chunk_rows(idx2, W, rows_c2)),
                             int(sel.sum())))
            self._big = (jnp.asarray(_chunk_rows(widx, n, rows_cw)), W,
                         lvl2, len(big))
        perm = np.concatenate(perm_parts) if perm_parts else np.arange(n)
        inv = np.empty(n, dtype=np.int32)
        inv[perm] = np.arange(n, dtype=np.int32)
        self._inv_perm = jnp.asarray(inv)

    def aggregate(self, h: jax.Array, kind: str) -> jax.Array:
        assert h.shape[0] == self.num_nodes
        return bucketed_aggregate(self.device_args(), self.static_meta(),
                                  h, kind)

    def device_args(self) -> dict:
        """The window tables as a pytree — pass these as jit ARGUMENTS.

        Closing over them instead embeds ~2E int32 of HLO constants and
        the axon remote compile dies with HTTP 413 (CLAUDE.md)."""
        return {
            "buckets": tuple(idx for idx, _ in self._buckets),
            "big": self._big[0] if self._big is not None else None,
            "lvl2": (tuple(idx2 for idx2, _ in self._big[2])
                     if self._big is not None else ()),
            "inv_perm": self._inv_perm,
        }

    def static_meta(self) -> tuple:
        """Hashable shape metadata matching :meth:`device_args`."""
        return (
            self._n0,
            tuple(rows for _, rows in self._buckets),
            self._big[1] if self._big is not None else None,
            (tuple(rows2 for _, rows2 in self._big[2])
             if self._big is not None else ()),
        )


def bucketed_aggregate(arrays: dict, meta: tuple, h: jax.Array,
                       kind: str) -> jax.Array:
    """Exact full-graph neighborhood aggregation from bucketed window
    tables (pure function of ``_BucketedNeighborhoods.device_args()`` /
    ``static_meta()`` — safe to call inside a jitted epoch with the
    tables threaded through as arguments)."""
    n0, bucket_rows, wrows, lvl2_rows = meta
    D = h.shape[1]
    hp = jnp.concatenate([h, jnp.zeros((1, D), h.dtype)], axis=0)
    outs = []
    if n0:
        outs.append(jnp.zeros((n0, D), h.dtype))
    for idx, rows in zip(arrays["buckets"], bucket_rows):
        outs.append(_window_reduce(hp, idx, kind)[:rows])
    if arrays["big"] is not None:
        partials = _window_reduce(hp, arrays["big"], kind)[:wrows]
        pp = jnp.concatenate(
            [partials, jnp.zeros((1, D), h.dtype)], axis=0)
        for idx2, rows2 in zip(arrays["lvl2"], lvl2_rows):
            outs.append(_window_reduce(pp, idx2, kind)[:rows2])
    out_perm = jnp.concatenate(outs, axis=0)
    return jnp.take(out_perm, arrays["inv_perm"], axis=0)


class _DeviceEdges:
    """HBM-resident padded edge list for chunked scatter aggregation.

    NOTE: retained for the GAT device path (whose per-edge softmax needs
    the edge list) and as the measured baseline; for sum/mean/max use
    :class:`_BucketedNeighborhoods` — TPU scatter serializes per index
    (~1 us/edge measured; the gather formulation is ~100x faster)."""

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


# backend='auto' switches to the device path at this edge count — the
# crossover is far below it (device wins by ~100x at 16M edges,
# benchmarks/infer_bench.py), but small graphs stay on host so toy evals
# never pay a device compile.
AUTO_DEVICE_EDGES = 2_000_000


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
    ``backend='auto'``: device when the graph is big enough that the host
    SpMM pass dominates (measured: host ≈ 11 min/pass at products hid256,
    BENCH_NOTES round 3), host below that (no compile cost on tiny evals).
    """
    if backend == "auto":
        backend = "device" if graph.num_edges >= AUTO_DEVICE_EDGES else "host"
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
    if cfg.arch == "gat":
        # per-edge attention softmax needs the explicit edge list
        return _gat_full_graph_device(params, cfg,
                                      _DeviceEdges(graph, edge_chunk),
                                      features)
    # sum/mean/max aggregation: scatter-free bucketed gather windows
    # (TPU scatter is ~1 us/edge — see _BucketedNeighborhoods)
    edges = _BucketedNeighborhoods(graph)
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
