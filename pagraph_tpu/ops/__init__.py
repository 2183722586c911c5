"""Compute kernels: masked block aggregation (XLA + Pallas), full-graph SpMM."""
from .aggregate import block_aggregate, block_aggregate_lstm, block_self, gather_rows
