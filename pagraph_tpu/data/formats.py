"""Dataset on-disk format: load/save.

Keeps the reference's dataset directory contract (reference: README.md:18-26,
PaGraph/data/get_data.py:8-103) so existing PaGraph datasets drop in:

    <dataset>/
      adj.npz        scipy sparse COO adjacency, A[dst, src] (vnum x vnum)
      feat.npy       float32 [vnum, dim]      (random 600-d if absent, parity
                                               with get_data.py:24-27)
      labels.npy     int64 [vnum]
      train.npy      bool [vnum] mask
      val.npy        bool [vnum] mask
      test.npy       bool [vnum] mask

Partition artifacts live in ``<dataset>/partition_<P>_<method>/`` (the
reference writes ``<dataset>/<P>naive/``; same four-file-per-rank contract,
reference: PaGraph/partition/dg.py:144-171):

      subadj_<r>.npz            local CSR adjacency (compact id space)
      sub_trainid_<r>.npy       train vertex ids in LOCAL space
      sub_train2fullid_<r>.npy  local -> full id map
      sub_label_<r>.npy         labels for all local vertices
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import scipy.sparse as spsp

from ..graph import CSRGraph

DEFAULT_RANDOM_FEAT_DIM = 600  # reference: PaGraph/data/get_data.py:25


@dataclasses.dataclass
class Dataset:
    graph: CSRGraph
    features: np.ndarray          # float32 [N, dim]
    labels: np.ndarray            # int64 [N]
    train_mask: np.ndarray        # bool [N]
    val_mask: np.ndarray
    test_mask: np.ndarray

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def feat_dim(self) -> int:
        return self.features.shape[1]

    @property
    def num_classes(self) -> int:
        return int(self.labels.max()) + 1 if len(self.labels) else 0

    @property
    def train_nids(self) -> np.ndarray:
        return np.nonzero(self.train_mask)[0].astype(np.int64)

    @property
    def val_nids(self) -> np.ndarray:
        return np.nonzero(self.val_mask)[0].astype(np.int64)

    @property
    def test_nids(self) -> np.ndarray:
        return np.nonzero(self.test_mask)[0].astype(np.int64)


def load_dataset(
    path: str,
    *,
    mmap_features: bool = False,
    random_feat_dim: int = DEFAULT_RANDOM_FEAT_DIM,
    seed: int = 0,
) -> Dataset:
    """Load a dataset directory (reference: data/get_data.py:8-77)."""
    adj = spsp.load_npz(os.path.join(path, "adj.npz"))
    graph = CSRGraph.from_coo(adj)
    n = graph.num_nodes

    feat_path = os.path.join(path, "feat.npy")
    if os.path.exists(feat_path):
        mode = "r" if mmap_features else None
        features = np.load(feat_path, mmap_mode=mode)
        if features.dtype != np.float32 and not mmap_features:
            features = features.astype(np.float32)
    else:
        # Parity with the reference's random-feature fallback (get_data.py:24-27).
        rng = np.random.default_rng(seed)
        features = rng.random((n, random_feat_dim), dtype=np.float32)

    labels = np.load(os.path.join(path, "labels.npy")).astype(np.int64)
    train_mask = np.load(os.path.join(path, "train.npy")).astype(bool)
    val_mask = np.load(os.path.join(path, "val.npy")).astype(bool)
    test_mask = np.load(os.path.join(path, "test.npy")).astype(bool)
    return Dataset(graph, features, labels, train_mask, val_mask, test_mask)


def save_dataset(path: str, ds: Dataset) -> None:
    os.makedirs(path, exist_ok=True)
    spsp.save_npz(os.path.join(path, "adj.npz"), ds.graph.to_coo())
    np.save(os.path.join(path, "feat.npy"), ds.features)
    np.save(os.path.join(path, "labels.npy"), ds.labels)
    np.save(os.path.join(path, "train.npy"), ds.train_mask)
    np.save(os.path.join(path, "val.npy"), ds.val_mask)
    np.save(os.path.join(path, "test.npy"), ds.test_mask)


# ---------------------------------------------------------------------------
# Partition artifacts (four-file contract, reference: dg.py:156-171)
# ---------------------------------------------------------------------------

def partition_dir(dataset_path: str, num_parts: int, method: str) -> str:
    return os.path.join(dataset_path, f"partition_{num_parts}_{method}")


@dataclasses.dataclass
class PartitionArtifact:
    graph: CSRGraph               # local compact id space
    train_nids: np.ndarray        # int64, LOCAL ids
    local2full: np.ndarray        # int64 [local_vnum]
    labels: np.ndarray            # int64 [local_vnum]

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes


def save_partition(dirpath: str, rank: int, part: PartitionArtifact) -> None:
    os.makedirs(dirpath, exist_ok=True)
    n = part.graph.num_nodes
    csr = spsp.csr_matrix(
        (np.ones(part.graph.num_edges, dtype=np.float32),
         part.graph.indices, part.graph.indptr),
        shape=(n, n),
    )
    spsp.save_npz(os.path.join(dirpath, f"subadj_{rank}.npz"), csr.tocoo())
    np.save(os.path.join(dirpath, f"sub_trainid_{rank}.npy"), part.train_nids)
    np.save(os.path.join(dirpath, f"sub_train2fullid_{rank}.npy"), part.local2full)
    np.save(os.path.join(dirpath, f"sub_label_{rank}.npy"), part.labels)


def load_partition(dirpath: str, rank: int) -> PartitionArtifact:
    adj = spsp.load_npz(os.path.join(dirpath, f"subadj_{rank}.npz"))
    graph = CSRGraph.from_coo(adj)
    train_nids = np.load(os.path.join(dirpath, f"sub_trainid_{rank}.npy")).astype(np.int64)
    local2full = np.load(os.path.join(dirpath, f"sub_train2fullid_{rank}.npy")).astype(np.int64)
    labels = np.load(os.path.join(dirpath, f"sub_label_{rank}.npy")).astype(np.int64)
    if len(labels) == len(train_nids) != graph.num_nodes:
        # Reference-written partitions store train-vertex labels only
        # (dg.py:154); scatter them into the full local space.
        full = np.zeros(graph.num_nodes, dtype=np.int64)
        full[train_nids] = labels
        labels = full
    return PartitionArtifact(graph, train_nids, local2full, labels)
