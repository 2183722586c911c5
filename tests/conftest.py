"""Test harness: force an 8-virtual-device CPU backend before jax imports.

This is the TPU-world "fake backend" the reference never had (SURVEY.md §4):
multi-chip sharding tests run on host-platform virtual devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize may have already imported jax and registered a
# TPU plugin; force the CPU platform via config (legal until first backend
# initialization).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from pagraph_tpu.data.synthetic import synthetic_dataset
from pagraph_tpu.utils.platform import tune_host_allocator

tune_host_allocator(256 << 20)  # slow-page-fault host: keep heap warm


@pytest.fixture(scope="session")
def tiny_ds():
    """Golden tiny dataset: 200 vertices, ~1200 edges, 16-dim features."""
    return synthetic_dataset(
        num_nodes=200, num_edges=1200, feat_dim=16, num_classes=5, seed=7
    )


@pytest.fixture(scope="session")
def small_ds():
    """Mid-size dataset for end-to-end runs: 2000 vertices, 16k edges."""
    return synthetic_dataset(
        num_nodes=2000, num_edges=16000, feat_dim=32, num_classes=10, seed=3
    )
