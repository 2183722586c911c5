"""Phase timers and profiling scopes.

TPU equivalent of the reference's profiler scopes (``record_function``
'gpu-load'/'gpu-compute' and the cache-internal scopes; reference:
examples/profile/pa_gcn.py:81-112, PaGraph/storage/storage.py:170-212):
lightweight host accumulators plus optional ``jax.profiler`` trace annotations
for TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimers:
    """Named accumulating wall-clock timers."""

    def __init__(self, use_jax_scopes: bool = False):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.use_jax_scopes = use_jax_scopes

    @contextlib.contextmanager
    def scope(self, name: str) -> Iterator[None]:
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if self.use_jax_scopes
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with ctx:
            yield
        self.total[name] += time.perf_counter() - t0
        self.count[name] += 1

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.total[k],
                "count": self.count[k],
                "mean_ms": 1e3 * self.total[k] / max(self.count[k], 1),
            }
            for k in sorted(self.total)
        }

    def report(self) -> str:
        lines = [f"{'phase':<16}{'total s':>10}{'count':>8}{'mean ms':>10}"]
        for k, v in self.summary().items():
            lines.append(
                f"{k:<16}{v['total_s']:>10.3f}{v['count']:>8}{v['mean_ms']:>10.3f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when ``logdir`` is set
    (the nvprof/torch-profiler analog, reference README.md:121-125)."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
