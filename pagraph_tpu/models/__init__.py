"""Model family: GCN, GraphSAGE, control-variate GCN.

Mirrors the reference's ``PaGraph/model`` package (gcn_nssc.py,
graphsage_nssc.py, gcn_cvsc.py) as pure functional pytree modules.
"""
from __future__ import annotations

from typing import Callable, Tuple

from ..config import ModelConfig
from . import gcn, sage


def get_model(cfg: ModelConfig) -> Tuple[Callable, Callable]:
    """Return ``(init_params, apply)`` for the configured architecture."""
    if cfg.arch == "gcn":
        return gcn.init_params, gcn.apply
    if cfg.arch == "graphsage":
        return sage.init_params, sage.apply
    if cfg.arch == "gcn_cv":
        from . import gcn_cv
        return gcn_cv.init_params, gcn_cv.apply
    if cfg.arch == "gat":
        from . import gat
        return gat.init_params, gat.apply
    if cfg.arch == "gin":
        from . import gin
        return gin.init_params, gin.apply
    raise ValueError(f"unknown arch {cfg.arch!r}")
