"""pagraph_tpu — TPU-native sampling-based GNN minibatch training framework.

A from-scratch JAX/XLA/Pallas re-design of the PaGraph capability set
(computation-aware self-reliant graph partitioning, degree-ranked HBM feature
caching, neighbor-sampled GCN/GraphSAGE training across a device mesh).
See SURVEY.md at the repo root for the reference layer map this covers.
"""
from .config import (
    CacheConfig,
    Config,
    ModelConfig,
    PartitionConfig,
    SamplerConfig,
    TrainConfig,
)
from .graph import CSRGraph, gcn_norm

__version__ = "0.1.0"
