"""Checkpoint save/restore + checkpoint-replay evaluation.

The reference only *consumes* checkpoints (``eval.py`` loads
``checkpoint/{arch}_{epoch}`` files that nothing in its tree writes —
SURVEY.md §5); here both directions exist: orbax-backed save of the full
train state (params, optimizer state, step, rng) every N epochs, resume, and
an eval-over-checkpoints pass replicating ``examples/eval.py:28-46``.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config
from .state import TrainState


def _ckpt_path(ckpt_dir: str, arch: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(ckpt_dir, f"{arch}_{epoch}"))


def save_checkpoint(ckpt_dir: str, arch: str, epoch: int,
                    state: TrainState, aux=None) -> str:
    """Write ``<ckpt_dir>/<arch>_<epoch>`` (reference naming,
    eval.py:30-32).

    ``aux`` is an optional pytree of model-side persistent state saved to a
    sibling ``<arch>_<epoch>.aux`` directory — used by gcn_cv to persist its
    control-variate histories (``hist``/``agg``), which live OUTSIDE the
    TrainState (the reference's gcn_cvsc.py keeps them in its graph store
    and cannot resume at all, SURVEY.md §5).  The ``.aux`` suffix keeps
    ``list_checkpoints`` and the eval-replay contract unchanged."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _ckpt_path(ckpt_dir, arch, epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    if aux is not None:
        ckptr.save(path + ".aux", jax.device_get(aux), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, arch: str, epoch: int,
                       template: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_path(ckpt_dir, arch, epoch),
                         jax.device_get(template))


def restore_aux(ckpt_dir: str, arch: str, epoch: int, template):
    """Restore the ``.aux`` sidecar saved next to ``<arch>_<epoch>``;
    returns None when the checkpoint predates aux saving (the caller
    decides whether zero-initialized state is acceptable)."""
    path = _ckpt_path(ckpt_dir, arch, epoch) + ".aux"
    if not os.path.isdir(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.device_get(template))


def save_aux_shards(ckpt_dir: str, arch: str, epoch: int, aux: Dict) -> str:
    """Multi-process CV aux: each process writes the dp-axis rows its
    devices own to ``<arch>_<epoch>.aux.p<process_index>.npz``.

    ``aux`` is ``{"hist": [global jax.Array [D, n, w], ...], "agg": [...]}``
    with the arrays sharded on the leading (device) axis — exactly the
    ``DataParallelTrainer._dev_hists/_dev_aggs`` stacks.  A plain
    ``device_get`` of those global arrays fails multi-process (no process
    holds the full value), which is why the single-file orbax ``.aux``
    sidecar cannot cover this case (the round-3 gap: dp_trainer warned
    instead of saving).  Keys are ``hist{b}_row{r}`` / ``agg{b}_row{r}``
    with r the GLOBAL dp row, so restore works for any process that owns
    row r — the process->row assignment just has to form a partition of
    the mesh, as any jax.distributed relaunch does."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = (_ckpt_path(ckpt_dir, arch, epoch)
            + f".aux.p{jax.process_index()}.npz")
    # manifest: writer layout, validated by open_aux_shards so stale shard
    # files from an earlier run with a different process count are never
    # silently indexed (ADVICE r4 #1)
    out = {"__nproc__": np.int64(jax.process_count()),
           "__pidx__": np.int64(jax.process_index())}
    for name, arrs in aux.items():
        for b, a in enumerate(arrs):
            for shard in a.addressable_shards:
                sl = shard.index[0]
                data = np.asarray(shard.data)
                start = sl.start or 0
                stop = a.shape[0] if sl.stop is None else sl.stop
                for i, r in enumerate(range(start, stop, sl.step or 1)):
                    out[f"{name}{b}_row{r}"] = data[i]
    np.savez(path, **out)
    return path


def open_aux_shards(ckpt_dir: str, arch: str, epoch: int):
    """Open the row files written by :func:`save_aux_shards` for lazy
    per-row access.

    Indexes the ``.aux.p*.npz`` siblings (a relaunch may assign rows to
    processes differently than the writer did — npz directories are read,
    row payloads are NOT) and returns a ``key -> np.ndarray`` callable
    covering ``{name}{b}_row{r}``, or None when no usable shard set exists
    (pre-aux or single-process checkpoint).  Each process materializes
    only the rows it asks for — the per-host-DRAM contract of the
    multihost design.

    Shard files carry a writer-layout manifest (``__nproc__``/``__pidx__``);
    only the unique COMPLETE set — all indices ``0..N-1`` of one claimed
    process count — is indexed.  Leftover files from an earlier run with a
    different process count are ignored with a warning instead of being
    last-wins merged into the index (ADVICE r4 #1)."""
    import glob
    import warnings

    base = _ckpt_path(ckpt_dir, arch, epoch)
    files = sorted(glob.glob(base + ".aux.p*.npz"))
    if not files:
        return None
    groups: Dict = {}          # claimed nproc -> {pidx: (fname, npz)}
    legacy = []                # pre-manifest files (round-4 writers)
    for f in files:
        z = np.load(f)
        if "__nproc__" in z.files:
            groups.setdefault(int(z["__nproc__"]), {})[int(z["__pidx__"])] = (f, z)
        else:
            legacy.append((f, z))
    chosen = None
    for nproc, members in groups.items():
        if set(members) == set(range(nproc)):
            chosen = [z for _, z in members.values()]  # at most one complete
            break                                      # group: all need p0
    stale = [f for f, _ in legacy] if chosen else []
    if chosen is not None:
        for nproc, members in groups.items():
            if set(members) != set(range(nproc)):
                stale.extend(f for f, _ in members.values())
    if chosen is None:
        if legacy and not groups:
            chosen = [z for _, z in legacy]   # old files, old behavior
        else:
            warnings.warn(
                f"no complete CV aux shard set next to {base} — leftover "
                f"files from a different process layout are ignored",
                RuntimeWarning, stacklevel=2)
            return None
    elif stale:
        warnings.warn(
            f"ignoring stale CV aux shard files next to {base} (written "
            f"under a different process layout): {stale}",
            RuntimeWarning, stacklevel=2)
    index = {}
    for z in chosen:
        for k in z.files:
            if not k.startswith("__"):
                index[k] = z
    return lambda key: np.asarray(index[key][key])


def list_checkpoints(ckpt_dir: str, arch: str) -> List[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    pat = re.compile(rf"^{re.escape(arch)}_(\d+)$")
    out = []
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def evaluate_checkpoints(
    cfg: Config,
    ckpt_dir: str,
    graph,
    features: np.ndarray,
    labels: np.ndarray,
    mask: np.ndarray,
    *,
    interval: int = 1,
    template: Optional[TrainState] = None,
    backend: str = "auto",
) -> Dict[int, float]:
    """Replay saved checkpoints on the test set and report accuracy per
    epoch (reference eval.py main loop, :28-46)."""
    from ..models.inference import evaluate
    from .state import create_state

    if template is None:
        template, _ = create_state(cfg)
    results: Dict[int, float] = {}
    for epoch in list_checkpoints(ckpt_dir, cfg.model.arch)[::interval]:
        state = restore_checkpoint(ckpt_dir, cfg.model.arch, epoch, template)
        acc = evaluate(state.params, cfg.model, graph, features, labels,
                       mask, backend=backend)
        results[epoch] = acc
    return results
