"""Utilities: timers, platform helpers."""
from .timers import PhaseTimers, maybe_trace
from .platform import enable_compilation_cache, free_hbm_bytes, device_memory_stats
