"""Device mesh construction.

The reference's process topology is one trainer process per GPU plus NCCL
(reference: examples/profile/pa_gcn.py:18-24,157).  On TPU the topology is a
``jax.sharding.Mesh``: one process drives all local chips, partitions map to
mesh coordinates, and every collective rides ICI via compiler-inserted ops.

Axes:
  * ``dp``   — data parallelism: one graph partition + cache shard per chip,
               gradient psum (the reference's only parallelism).
  * ``halo`` — optional spatial axis for edge-partitioned halo exchange
               (all_to_all), the TPU-first extension (SURVEY.md §2.3 N5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "dp",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}"
            )
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def dp_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Leading-axis sharding: one slice per mesh coordinate."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
