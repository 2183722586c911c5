"""Synthetic graph generation.

Covers the reference's dataset tooling for smoke tests and benchmarks:
uniform G(n, m) random graphs (reference: PaGraph/data/gen_dataset.py:7-10 via
networkx) and an RMAT generator (the reference shells out to the external C++
PaRMAT tool, README.md:36-41; here it is a vectorized numpy implementation so
no external binary is needed).  Random features / labels / split masks follow
PaGraph/data/preprocess.py:50-114.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as spsp

from ..graph import CSRGraph
from .formats import Dataset


def random_coo(
    num_nodes: int,
    num_edges: int,
    *,
    seed: int = 0,
    self_loops: bool = False,
) -> spsp.coo_matrix:
    """Uniform directed G(n, m) multigraph edges, dedup'd."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    dst = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    if not self_loops:
        keep = src != dst
        src, dst = src[keep], dst[keep]
    data = np.ones(len(src), dtype=np.float32)
    coo = spsp.coo_matrix((data, (dst, src)), shape=(num_nodes, num_nodes))
    return coo


def rmat_coo(
    scale: int,
    edge_factor: int = 16,
    *,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
) -> spsp.coo_matrix:
    """R-MAT power-law graph: 2**scale vertices, edge_factor * V edges.

    Vectorized recursive quadrant descent (Graph500 parameters by default).
    Replaces the reference's external PaRMAT dependency (README.md:36-41).
    """
    n = 1 << scale
    m = n * edge_factor
    rng = np.random.default_rng(seed)
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for bit in range(scale):
        r = rng.random(m)
        # quadrant probabilities: (0,0)=a, (0,1)=b, (1,0)=c, (1,1)=d
        src_bit = (r >= a + b).astype(np.int64)
        dst_bit = (((r >= a) & (r < a + b)) | (r >= a + b + c)).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    keep = src != dst
    src, dst = src[keep], dst[keep]
    data = np.ones(len(src), dtype=np.float32)
    return spsp.coo_matrix((data, (dst, src)), shape=(n, n))


def rmat_csr(
    scale: int,
    edge_factor: int = 16,
    *,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
    backend: str = "auto",
) -> CSRGraph:
    """R-MAT graph straight to in-CSR — the papers100M-scale generation path.

    ``backend="native"`` draws edges with the parallel C++ kernel
    (``pg_rmat_gen``: per-edge splitmix64 streams; self-loops re-drawn
    instead of filtered) and builds the deduplicated CSR with
    ``pg_coo_to_csr`` — same R-MAT distribution as :func:`rmat_coo` but a
    different RNG, so graphs are NOT bit-identical across backends (the
    CSR builder itself is scipy-parity, tested).  numpy fallback = the
    rmat_coo + from_coo path that cost 2,570 s + 99 s at rmat24x32
    (SCALE_r04_hops2.json).
    """
    if backend == "auto":
        try:
            from ..sampling.native import get_lib
            get_lib()
            backend = "native"
        except Exception:
            backend = "numpy"
    if backend == "native":
        from ..sampling.native import coo_to_csr_native, rmat_edges_native
        src, dst = rmat_edges_native(scale, (1 << scale) * edge_factor,
                                     a=a, b=b, c=c, seed=seed)
        return coo_to_csr_native(src, dst, 1 << scale)
    return CSRGraph.from_coo(rmat_coo(scale, edge_factor, a=a, b=b, c=c,
                                      seed=seed))


def random_split_masks(
    num_nodes: int,
    *,
    train_frac: float = 0.65,
    val_frac: float = 0.10,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """65/10/25 split (reference: data/preprocess.py:83-114)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_nodes)
    n_train = int(num_nodes * train_frac)
    n_val = int(num_nodes * val_frac)
    train = np.zeros(num_nodes, dtype=bool)
    val = np.zeros(num_nodes, dtype=bool)
    test = np.zeros(num_nodes, dtype=bool)
    train[perm[:n_train]] = True
    val[perm[n_train:n_train + n_val]] = True
    test[perm[n_train + n_val:]] = True
    return train, val, test


def neighborhood_labels(
    graph: CSRGraph,
    features: np.ndarray,
    num_classes: int,
    *,
    seed: int = 0,
    self_weight: float = 0.3,
    hop2_weight: float = 0.5,
    chunk_rows: Optional[int] = None,
) -> np.ndarray:
    """Labels from a 2-hop TEACHER so accuracy exercises the GNN, not just
    the per-vertex features (VERDICT r2 #1: ``argmax(x @ proj)`` labels are
    a linear probe of a vertex's OWN features — a model that ignores
    neighbor aggregation entirely can score well on them).

    ``label(v) = argmax_c  w_s·z(x_v P) + 1.0·z(m¹_v Q) + w_2·z(m²_v R)``

    where ``m¹`` / ``m²`` are the exact 1-/2-hop in-neighbor mean
    aggregations (the same direction + normalization the models aggregate,
    storage/full_graph_mean_aggregate == reference pa_server.py:45-52),
    P/Q/R are independent random projections, features are centered so no
    class dominates globally, and each term is globally z-scored so the
    1/√deg variance shrink of neighbor means does not silence them.  The
    neighbor terms dominate (1.0 + 0.5 vs 0.3): a structure-blind model
    (MLP on x_v alone) only sees the self term and measurably fails, while
    a 2-layer GNN can represent the teacher exactly.  Gap measured by
    ``models/mlp_probe.py`` + tests/test_structure_labels.py.

    ``chunk_rows``: row-chunked scoring for papers100M-class vertex counts —
    the dense path materializes two live ``[n, num_classes]`` f32 score
    matrices (25 GB each at 134M vertices / 47 classes); the chunked path
    streams them, recomputing each chunk's projections three times (mean /
    std / argmax passes, float64 moments).  Statistically identical labels;
    not bit-identical at argmax ties (summation-order float noise)."""
    from ..storage.feature_store import full_graph_mean_aggregate

    rng = np.random.default_rng(seed)
    x = np.asarray(features, dtype=np.float32)
    d = x.shape[1]
    if chunk_rows is None:
        xc = x - x.mean(axis=0, keepdims=True)
        agg1 = full_graph_mean_aggregate(graph, xc)
        agg2 = full_graph_mean_aggregate(graph, agg1)

        def term(m: np.ndarray, w: float) -> np.ndarray:
            s = m @ rng.normal(size=(d, num_classes)).astype(np.float32)
            return (w / (s.std() + 1e-8)) * s

        score = (term(xc, self_weight) + term(agg1, 1.0)
                 + term(agg2, hop2_weight))
        return np.argmax(score, axis=1).astype(np.int64)

    n = graph.num_nodes
    xc = x if x is not features else x.copy()
    xc -= xc.mean(axis=0, keepdims=True)
    agg1 = full_graph_mean_aggregate(graph, xc)
    agg2 = full_graph_mean_aggregate(graph, agg1)
    mats = [xc, agg1, agg2]
    weights = [self_weight, 1.0, hop2_weight]
    # identical draw order to the dense path: P (self), Q (1-hop), R (2-hop)
    projs = [rng.normal(size=(d, num_classes)).astype(np.float32)
             for _ in range(3)]
    total = n * num_classes
    means = np.zeros(3, dtype=np.float64)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        for t in range(3):
            means[t] += np.sum(mats[t][lo:hi] @ projs[t], dtype=np.float64)
    means /= total
    sqdev = np.zeros(3, dtype=np.float64)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        for t in range(3):
            s = (mats[t][lo:hi] @ projs[t]).astype(np.float64)
            s -= means[t]
            sqdev[t] += np.sum(s * s)
    stds = np.sqrt(sqdev / total)
    coef = np.asarray(weights) / (stds + 1e-8)
    labels = np.empty(n, dtype=np.int64)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        score = np.zeros((hi - lo, num_classes), dtype=np.float32)
        for t in range(3):
            score += np.float32(coef[t]) * (mats[t][lo:hi] @ projs[t])
        labels[lo:hi] = score.argmax(axis=1)
    return labels


def synthetic_dataset(
    num_nodes: int = 10_000,
    num_edges: int = 40_000,
    *,
    feat_dim: int = 600,
    num_classes: int = 60,
    kind: str = "uniform",          # uniform | rmat
    seed: int = 0,
    train_frac: float = 0.65,
    learnable=False,                # False | True/"linear" | "neighborhood"
) -> Dataset:
    """A complete in-memory dataset for tests and benchmarks.

    ``learnable`` selects the label generator:

    - ``False``: uniform noise (loss cannot decrease — timing-only runs);
    - ``True`` / ``"linear"``: argmax of a random linear projection of the
      vertex's OWN features — training reduces loss, but the task is
      structure-FREE (an MLP solves it; exercises the training loop, not
      the aggregation path);
    - ``"neighborhood"``: 2-hop teacher labels (``neighborhood_labels``)
      whose signal is dominated by neighbor aggregations — the accuracy
      anchor that actually tests the GNN.
    """
    if kind == "uniform":
        coo = random_coo(num_nodes, num_edges, seed=seed)
    elif kind == "rmat":
        scale = int(np.ceil(np.log2(max(num_nodes, 2))))
        coo = rmat_coo(scale, max(1, num_edges // (1 << scale)), seed=seed)
        num_nodes = coo.shape[0]
    else:
        raise ValueError(f"unknown kind {kind!r}")
    graph = CSRGraph.from_coo(coo)
    rng = np.random.default_rng(seed + 1)
    features = rng.random((graph.num_nodes, feat_dim), dtype=np.float32)
    if learnable == "neighborhood":
        labels = neighborhood_labels(graph, features, num_classes,
                                     seed=seed + 1)
    elif learnable:                  # True or "linear"
        proj = rng.normal(size=(feat_dim, num_classes)).astype(np.float32)
        labels = np.argmax(features @ proj, axis=1).astype(np.int64)
    else:
        labels = rng.integers(0, num_classes, size=graph.num_nodes).astype(np.int64)
    train, val, test = random_split_masks(
        graph.num_nodes, train_frac=train_frac, seed=seed + 2
    )
    return Dataset(graph, features, labels, train, val, test)
