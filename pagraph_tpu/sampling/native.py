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
