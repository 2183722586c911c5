"""Hash (random-chunk) partitioner — the naive baseline.

Re-design of the reference's ``PaGraph/partition/hash.py:31-70``: shuffle the
train vertices, chunk them evenly across partitions, expand each chunk to its
``num_hops`` self-reliant closure.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..data.formats import PartitionArtifact
from ..graph import CSRGraph
from .utils import extract_partition


def hash_partition(
    graph: CSRGraph,
    train_nids: np.ndarray,
    labels: np.ndarray,
    num_parts: int,
    hops: int,
    *,
    seed: int = 0,
) -> List[PartitionArtifact]:
    train_nids = np.asarray(train_nids, dtype=np.int64)
    rng = np.random.default_rng(seed)
    shuffled = train_nids[rng.permutation(len(train_nids))]
    chunks = np.array_split(shuffled, num_parts)
    return [
        extract_partition(graph, np.sort(chunk), labels, hops)
        for chunk in chunks
    ]
