"""Platform helpers: compilation cache, device info, HBM budget.

TPU-native replacement for the reference's CUDA introspection
(``torch.cuda.max_memory_allocated``/``get_device_properties``,
reference: PaGraph/storage/storage.py:78-80).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/pagraph_tpu_jax")


def enable_compilation_cache(path: str = _DEFAULT_CACHE_DIR) -> None:
    """Persist compiled executables across processes (first TPU compile can
    be tens of seconds; every CLI should call this)."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Best-effort HBM stats for a device (bytes). Keys: bytes_in_use,
    bytes_limit; falls back to a conservative default when the backend
    doesn't expose stats (e.g. CPU)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if not limit:
        limit = 16 * (1 << 30)  # assume one v5e-class chip
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", 0)),
        "bytes_limit": int(limit),
    }


def free_hbm_bytes(device: Optional[jax.Device] = None,
                   reserve: int = 1 << 30) -> int:
    """Free HBM after a reserve margin — the analog of the reference's
    ``total - peak_allocated - peak_cached - 1 GiB`` probe
    (storage.py:77-88)."""
    s = device_memory_stats(device)
    return max(0, s["bytes_limit"] - s["bytes_in_use"] - reserve)
