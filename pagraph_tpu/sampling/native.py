"""ctypes binding + lazy build of the native host kernels.

The shared library is compiled from ``native/pagraph_native.cpp`` on first
use (g++ -O3 -fopenmp) and cached next to the source; ``pybind11`` is not
available in this image so the ABI is plain C via ctypes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..config import SamplerConfig
from ..graph import CSRGraph
from .block import Block, MiniBatch

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pagraph_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "_pagraph_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.pg_sample_minibatch.restype = ctypes.c_int
        lib.pg_sample_minibatch.argtypes = [
            _i64p, _i32p, ctypes.c_int64,            # indptr, indices, num_nodes
            _i64p, ctypes.c_int64,                    # seeds, num_seeds
            _i32p, ctypes.c_int32, _i64p,             # fanouts[hops], hops, caps
            ctypes.c_uint64,                          # seed
            _i32p,                                    # pos_of scratch
            _i32p, _i64p,                             # layer_nids, layer_sizes
            _i32p, _u8p, _i32p,                       # neigh_pos, neigh_mask, self_pos
        ]
        lib.pg_gather_rows_f32.restype = None
        lib.pg_gather_rows_f32.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64, _f32p,
        ]
        lib.pg_dg_assign.restype = ctypes.c_int
        lib.pg_dg_assign.argtypes = [
            _i64p, _i32p, ctypes.c_int64,             # indptr, indices, n
            _i64p, ctypes.c_int64,                    # train_nids, num_train
            ctypes.c_int32, ctypes.c_int32,           # num_parts, hops
            ctypes.c_double,                          # avg (weight units)
            _f64p,                                    # weights (NULL -> 1.0)
            _i32p,                                    # out belongs
        ]
        # --- offline-pipeline kernels (round 5) ---
        _u64p = ctypes.POINTER(ctypes.c_uint64)
        _i8p = ctypes.POINTER(ctypes.c_int8)
        lib.pg_rmat_gen.restype = None
        lib.pg_rmat_gen.argtypes = [
            ctypes.c_int32, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_uint64, _i32p, _i32p,
        ]
        lib.pg_random_i8.restype = None
        lib.pg_random_i8.argtypes = [ctypes.c_int64, ctypes.c_uint64, _i8p]
        lib.pg_coo_to_csr.restype = ctypes.c_int64
        lib.pg_coo_to_csr.argtypes = [
            _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            _i64p, _i32p, _i64p, _i32p,
        ]
        lib.pg_hop_closure.restype = None
        lib.pg_hop_closure.argtypes = [
            _i64p, _i32p, ctypes.c_int64,
            _i64p, ctypes.c_int64, ctypes.c_int32,
            _u64p, _u64p,
        ]
        lib.pg_bitmap_extract.restype = ctypes.c_int64
        lib.pg_bitmap_extract.argtypes = [_u64p, ctypes.c_int64, _i64p]
        lib.pg_map_rows.restype = ctypes.c_int
        lib.pg_map_rows.argtypes = [
            _i64p, _i32p, _i32p, _i64p, _i64p, ctypes.c_int64, _i32p,
        ]
        lib.pg_histogram_i32.restype = None
        lib.pg_histogram_i32.argtypes = [
            _i32p, ctypes.c_int64, ctypes.c_int64, _i32p,
        ]
        lib.pg_spmm_mean_f32.restype = None
        lib.pg_spmm_mean_f32.argtypes = [
            _i64p, _i32p, ctypes.c_int64, _f32p, ctypes.c_int64, _f32p, _f32p,
        ]
        lib.pg_gather_rows_i8.restype = None
        lib.pg_gather_rows_i8.argtypes = [
            _i8p, ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64, _i8p,
        ]
        lib.pg_spmm_mean_i8.restype = None
        lib.pg_spmm_mean_i8.argtypes = [
            _i64p, _i32p, _i8p, ctypes.c_int64, _f32p, _f32p,
            ctypes.c_int64, ctypes.c_int64, _f32p,
        ]
        _lib = lib
        return lib


def _ptr(arr: np.ndarray, typ):
    return arr.ctypes.data_as(typ)


class NativeSampler:
    """Drop-in backend for :class:`NeighborSampler` (same semantics as the
    numpy path; property-tested equivalent)."""

    def __init__(self, graph: CSRGraph, config: SamplerConfig, caps):
        self.lib = get_lib()
        self.graph = graph
        self.config = config
        self.caps = np.asarray(caps, dtype=np.int64)
        self.hops = config.num_hops
        # hop-ordered for the C call ([0] = from the seeds) and block-ordered
        # for the output layout (outermost block first)
        self.hop_fanouts = np.asarray(config.hop_fanouts(), dtype=np.int32)
        self.block_fanouts = np.asarray(config.block_fanouts(), dtype=np.int64)
        if not config.include_self:
            raise NotImplementedError("native sampler requires include_self")
        self._pos_of = np.full(graph.num_nodes, -1, dtype=np.int32)
        self._nid_off = np.concatenate([[0], np.cumsum(self.caps)])
        dst_caps = self.caps[1:]
        self._blk_off = np.concatenate(
            [[0], np.cumsum(dst_caps * self.block_fanouts)])
        self._self_off = np.concatenate([[0], np.cumsum(dst_caps)])

    def sample(self, seeds: np.ndarray, labels: Optional[np.ndarray],
               seed: int) -> MiniBatch:
        g, caps, hops = self.graph, self.caps, self.hops
        seeds = np.ascontiguousarray(seeds, dtype=np.int64)
        layer_nids = np.zeros(int(caps.sum()), dtype=np.int32)
        layer_sizes = np.zeros(hops + 1, dtype=np.int64)
        neigh_pos = np.zeros(int(self._blk_off[-1]), dtype=np.int32)
        neigh_mask = np.zeros(int(self._blk_off[-1]), dtype=np.uint8)
        self_pos = np.zeros(int(self._self_off[-1]), dtype=np.int32)
        rc = self.lib.pg_sample_minibatch(
            _ptr(g.indptr, _i64p), _ptr(g.indices, _i32p),
            ctypes.c_int64(g.num_nodes),
            _ptr(seeds, _i64p), ctypes.c_int64(len(seeds)),
            _ptr(self.hop_fanouts, _i32p), ctypes.c_int32(hops),
            _ptr(caps, _i64p), ctypes.c_uint64(seed & (2**64 - 1)),
            _ptr(self._pos_of, _i32p),
            _ptr(layer_nids, _i32p), _ptr(layer_sizes, _i64p),
            _ptr(neigh_pos, _i32p), _ptr(neigh_mask, _u8p),
            _ptr(self_pos, _i32p),
        )
        if rc != 0:
            raise ValueError(f"native sampler failed (rc={rc})")

        nids, masks, blocks = [], [], []
        for i in range(hops + 1):
            sl = slice(int(self._nid_off[i]), int(self._nid_off[i + 1]))
            nids.append(layer_nids[sl])
            m = np.zeros(int(caps[i]), dtype=bool)
            m[: int(layer_sizes[i])] = True
            masks.append(m)
        for b in range(hops):
            cap_dst = int(caps[b + 1])
            fb = int(self.block_fanouts[b])
            psl = slice(int(self._blk_off[b]), int(self._blk_off[b + 1]))
            ssl = slice(int(self._self_off[b]), int(self._self_off[b + 1]))
            blocks.append(Block(
                neigh_pos=neigh_pos[psl].reshape(cap_dst, fb),
                neigh_mask=neigh_mask[psl].reshape(cap_dst, fb).astype(bool),
                self_pos=self_pos[ssl],
            ))
        if labels is not None:
            lab = np.zeros(int(caps[-1]), dtype=np.int32)
            lab[: len(seeds)] = labels[seeds].astype(np.int32)
        else:
            lab = np.zeros(int(caps[-1]), dtype=np.int32)
        return MiniBatch(layer_nids=tuple(nids), layer_mask=tuple(masks),
                         blocks=tuple(blocks), labels=lab)


def gather_rows_f32(src: np.ndarray, ids: np.ndarray,
                    out: Optional[np.ndarray] = None) -> np.ndarray:
    """OpenMP row gather: out[i] = src[ids[i]]."""
    lib = get_lib()
    src = np.ascontiguousarray(src, dtype=np.float32)
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    if out is None:
        out = np.empty((len(ids), src.shape[1]), dtype=np.float32)
    lib.pg_gather_rows_f32(
        _ptr(src, _f32p), ctypes.c_int64(src.shape[0]),
        ctypes.c_int64(src.shape[1]), _ptr(ids, _i64p),
        ctypes.c_int64(len(ids)), _ptr(out, _f32p),
    )
    return out


def rmat_edges_native(scale: int, num_edges: int, *, a: float = 0.57,
                      b: float = 0.19, c: float = 0.19,
                      seed: int = 0) -> tuple:
    """Parallel R-MAT edge draw -> (src, dst) int32 arrays of EXACTLY
    ``num_edges`` (self-loops re-drawn; duplicates removed at CSR build).
    Replaces the numpy bit-loop in data/synthetic.py:rmat_coo that cost
    2,570 s at rmat24x32 (SCALE_r04_hops2.json)."""
    lib = get_lib()
    src = np.empty(num_edges, dtype=np.int32)
    dst = np.empty(num_edges, dtype=np.int32)
    lib.pg_rmat_gen(ctypes.c_int32(scale), ctypes.c_int64(num_edges),
                    ctypes.c_double(a), ctypes.c_double(b), ctypes.c_double(c),
                    ctypes.c_uint64(seed & (2**64 - 1)),
                    _ptr(src, _i32p), _ptr(dst, _i32p))
    return src, dst


def random_i8_native(shape, seed: int = 0) -> np.ndarray:
    """Uniform int8 in [-127, 127] (pre-quantized feature tier, scale 1/127)."""
    lib = get_lib()
    out = np.empty(shape, dtype=np.int8)
    lib.pg_random_i8(ctypes.c_int64(out.size),
                     ctypes.c_uint64(seed & (2**64 - 1)),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out


def coo_to_csr_native(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                      *, drop_self: bool = False) -> CSRGraph:
    """COO (src->dst) to in-CSR: parallel histogram + scatter + per-row
    sort/dedup (scipy-parity: matches ``CSRGraph.from_coo``; tested).  Peak
    memory = src + dst + E*4 indices + N*8 scratch."""
    lib = get_lib()
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    m, n = len(src), int(num_nodes)
    indptr = np.empty(n + 1, dtype=np.int64)
    indices = np.empty(m, dtype=np.int32)
    cursor = np.empty(n, dtype=np.int64)
    out_deg = np.empty(n, dtype=np.int32)
    e = lib.pg_coo_to_csr(
        _ptr(src, _i32p), _ptr(dst, _i32p), ctypes.c_int64(m),
        ctypes.c_int64(n), ctypes.c_int32(1 if drop_self else 0),
        _ptr(indptr, _i64p), _ptr(indices, _i32p), _ptr(cursor, _i64p),
        _ptr(out_deg, _i32p))
    del cursor
    return CSRGraph(indptr=indptr, indices=np.ascontiguousarray(indices[:e]),
                    out_degrees=out_deg)


def hop_closure_native(graph: CSRGraph, seeds: np.ndarray, hops: int) -> tuple:
    """Bitmap BFS closure -> ``(closure_ids, interior_ids)`` sorted int64 —
    identical sets to ``partition.utils.hop_closure`` (property-tested), at
    native speed (the 2,112 s numpy extraction phase of SCALE_r04)."""
    lib = get_lib()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    n = graph.num_nodes
    words = (n + 63) // 64
    visited = np.zeros(words, dtype=np.uint64)
    interior = np.zeros(words, dtype=np.uint64)
    _u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.pg_hop_closure(
        _ptr(graph.indptr, _i64p), _ptr(graph.indices, _i32p),
        ctypes.c_int64(n), _ptr(seeds, _i64p), ctypes.c_int64(len(seeds)),
        ctypes.c_int32(hops), _ptr(visited, _u64p), _ptr(interior, _u64p))
    if hops == 0:
        interior = visited
    out_v = np.empty(n, dtype=np.int64)
    cnt_v = lib.pg_bitmap_extract(_ptr(visited, _u64p),
                                  ctypes.c_int64(words), _ptr(out_v, _i64p))
    out_i = np.empty(n, dtype=np.int64)
    cnt_i = lib.pg_bitmap_extract(_ptr(interior, _u64p),
                                  ctypes.c_int64(words), _ptr(out_i, _i64p))
    return (np.ascontiguousarray(out_v[:cnt_v]),
            np.ascontiguousarray(out_i[:cnt_i]))


def map_rows_native(graph: CSRGraph, full2sub: np.ndarray, rows: np.ndarray,
                    out_starts: np.ndarray, total: int) -> np.ndarray:
    """Parallel sub-CSR row fill: out[starts[i]:...] = full2sub[nbrs(rows[i])].
    Raises if any neighbor is outside the closure."""
    lib = get_lib()
    full2sub = np.ascontiguousarray(full2sub, dtype=np.int32)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    out_starts = np.ascontiguousarray(out_starts, dtype=np.int64)
    out = np.empty(total, dtype=np.int32)
    rc = lib.pg_map_rows(
        _ptr(graph.indptr, _i64p), _ptr(graph.indices, _i32p),
        _ptr(full2sub, _i32p), _ptr(rows, _i64p), _ptr(out_starts, _i64p),
        ctypes.c_int64(len(rows)), _ptr(out, _i32p))
    if rc != 0:
        raise ValueError("closure must contain all interior in-neighbors")
    return out


def histogram_i32_native(values: np.ndarray, nbins: int) -> np.ndarray:
    """Parallel ``np.bincount(values, minlength=nbins)`` for int32 values."""
    lib = get_lib()
    values = np.ascontiguousarray(values, dtype=np.int32)
    out = np.empty(nbins, dtype=np.int32)
    lib.pg_histogram_i32(_ptr(values, _i32p), ctypes.c_int64(len(values)),
                         ctypes.c_int64(nbins), _ptr(out, _i32p))
    return out


def spmm_mean_native(graph: CSRGraph, x: np.ndarray,
                     norm: np.ndarray) -> np.ndarray:
    """out[v] = norm[v] * sum of in-neighbor rows of x (f32, parallel)."""
    lib = get_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    norm = np.ascontiguousarray(norm, dtype=np.float32)
    out = np.empty_like(x)
    lib.pg_spmm_mean_f32(
        _ptr(graph.indptr, _i64p), _ptr(graph.indices, _i32p),
        ctypes.c_int64(graph.num_nodes), _ptr(x, _f32p),
        ctypes.c_int64(x.shape[1]), _ptr(norm, _f32p), _ptr(out, _f32p))
    return out


def spmm_mean_i8_native(graph: CSRGraph, x_i8: np.ndarray,
                        scale: np.ndarray, norm: np.ndarray,
                        row_lo: int, row_hi: int,
                        out: Optional[np.ndarray] = None) -> np.ndarray:
    """Mean-aggregate rows [row_lo, row_hi) of the pre-quantized int8
    feature matrix -> f32 [row_hi-row_lo, d] (exact: per-column scale
    factors out of the neighbor sum)."""
    lib = get_lib()
    assert x_i8.dtype == np.int8 and x_i8.flags.c_contiguous
    d = x_i8.shape[1]
    scale = np.ascontiguousarray(scale, dtype=np.float32)
    norm = np.ascontiguousarray(norm, dtype=np.float32)
    if out is None:
        out = np.empty((row_hi - row_lo, d), dtype=np.float32)
    _i8p = ctypes.POINTER(ctypes.c_int8)
    lib.pg_spmm_mean_i8(
        _ptr(graph.indptr, _i64p), _ptr(graph.indices, _i32p),
        x_i8.ctypes.data_as(_i8p), ctypes.c_int64(d),
        _ptr(norm, _f32p), _ptr(scale, _f32p),
        ctypes.c_int64(row_lo), ctypes.c_int64(row_hi), _ptr(out, _f32p))
    return out


def gather_rows_i8(src: np.ndarray, ids: np.ndarray,
                   out: Optional[np.ndarray] = None) -> np.ndarray:
    """OpenMP int8 row gather: out[i] = src[ids[i]] (pre-quantized tier)."""
    lib = get_lib()
    assert src.dtype == np.int8 and src.flags.c_contiguous
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    if out is None:
        out = np.empty((len(ids), src.shape[1]), dtype=np.int8)
    _i8p = ctypes.POINTER(ctypes.c_int8)
    lib.pg_gather_rows_i8(
        src.ctypes.data_as(_i8p), ctypes.c_int64(src.shape[0]),
        ctypes.c_int64(src.shape[1]), _ptr(ids, _i64p),
        ctypes.c_int64(len(ids)), out.ctypes.data_as(_i8p))
    return out


def dg_assign_native(graph: CSRGraph, train_nids: np.ndarray,
                     num_parts: int, hops: int, avg: float,
                     weights: Optional[np.ndarray] = None) -> np.ndarray:
    """C++ greedy dg assignment — bit-identical to the numpy stream in
    ``partition.dg_part.dg_assign`` (same double arithmetic and tie rules),
    minus the per-vertex Python overhead (the papers100M-scale path).
    ``weights`` (float64 per train vertex, with ``avg`` in the same units)
    switches the balance term to weighted loads — the edge-balance mode."""
    lib = get_lib()
    train_nids = np.ascontiguousarray(train_nids, dtype=np.int64)
    out = np.empty(len(train_nids), dtype=np.int32)
    if weights is not None:
        weights = np.ascontiguousarray(weights, dtype=np.float64)
        wp = _ptr(weights, _f64p)
    else:
        wp = ctypes.cast(None, _f64p)
    rc = lib.pg_dg_assign(
        _ptr(graph.indptr, _i64p), _ptr(graph.indices, _i32p),
        ctypes.c_int64(graph.num_nodes),
        _ptr(train_nids, _i64p), ctypes.c_int64(len(train_nids)),
        ctypes.c_int32(num_parts), ctypes.c_int32(hops),
        ctypes.c_double(avg), wp, _ptr(out, _i32p),
    )
    if rc != 0:
        raise ValueError(f"native dg_assign failed (rc={rc})")
    return out
