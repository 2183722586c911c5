"""Platform helpers: compilation cache, device info, HBM budget.

TPU-native replacement for the reference's CUDA introspection
(``torch.cuda.max_memory_allocated``/``get_device_properties``,
reference: PaGraph/storage/storage.py:78-80).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import jax

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/pagraph_tpu_jax")

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_allocator_tuned = False


def trim_host_allocator() -> None:
    """One-shot ``malloc_trim(0)``: hand the heap's freed tail back to the
    OS.  ``tune_host_allocator`` disables automatic trimming so freed numpy
    temporaries stay warm — the right default on this slow-fault host, but
    a 0.5B+-edge offline pipeline accumulates tens of GB of retained arena
    between phases (the round-5 rmat27 CPU-mesh OOM).  Call between phases
    when the next one needs the headroom more than the warmth."""
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.malloc_trim(ctypes.c_size_t(0))
    except Exception:
        pass


def tune_host_allocator(warm_bytes: int = 0, threads: int = 4) -> None:
    """Work around pathologically slow first-touch page faults.

    On some virtualized hosts (including this TPU-attached VM class), faulting
    fresh anonymous pages runs at ~15 MB/s while warm memory moves at GB/s.
    glibc's default behavior mmaps every allocation >128 KiB and returns it to
    the OS on free, so *every* large numpy temporary re-faults its pages —
    numpy hot loops become 100-1000x slower than normal.

    Fix: serve large allocations from the (never-trimmed) heap arena so freed
    pages stay warm, and pre-fault the arena once with parallel first-touch
    (page faults scale across threads).  Measured effect on this host: 16.7M
    element numpy ops drop from ~10-20 s to ~25 ms.
    """
    global _allocator_tuned
    if _allocator_tuned:
        return
    _allocator_tuned = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, ctypes.c_int(1 << 30))
        libc.mallopt(_M_TRIM_THRESHOLD, ctypes.c_int(-1))
    except Exception:
        return
    if warm_bytes <= 0:
        return
    import concurrent.futures as cf

    import numpy as np

    buf = np.empty(warm_bytes // 8, dtype=np.float64)
    n = len(buf)
    chunk = (n + threads - 1) // threads
    with cf.ThreadPoolExecutor(threads) as ex:
        list(
            ex.map(
                lambda i: buf[i * chunk : (i + 1) * chunk].fill(0),
                range(threads),
            )
        )
    del buf  # pages stay in the heap arena, warm


def parallel_random(shape, *, dtype="float32", seed: int = 0,
                    threads: int = 4):
    """Multi-threaded uniform random fill.

    On this host, generating tens of GB with one thread is dominated by
    first-touch page faults (~20 MB/s); independent per-chunk PCG streams
    across threads parallelize both the fault and the generation."""
    import concurrent.futures as cf

    import numpy as np

    out = np.empty(shape, dtype=dtype)
    flat = out.reshape(-1)
    n = flat.size
    chunk = (n + threads - 1) // threads

    def fill(i):
        rng = np.random.default_rng(np.random.SeedSequence((seed, i)))
        lo = i * chunk
        hi = min(n, lo + chunk)
        if lo < hi:
            rng.random(out=flat[lo:hi], dtype=out.dtype)

    with cf.ThreadPoolExecutor(threads) as ex:
        list(ex.map(fill, range(threads)))
    return out


def use_fast_prng() -> None:
    """Switch the default PRNG from threefry2x32 to rbg.

    Threefry key derivation + bit generation inside the training scan
    (dropout masks over [cap0, dim], per-hop sampling draws) measured ~25%
    of the on-device epoch; rbg uses the hardware RNG primitive and is much
    cheaper on TPU.  Streams are still deterministic per (key, shape) on a
    fixed backend/version, but differ from threefry streams - call before
    building any train state, never mid-run."""
    jax.config.update("jax_default_prng_impl", "rbg")


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
