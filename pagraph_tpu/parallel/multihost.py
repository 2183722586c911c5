"""Multi-process (multi-host) training over ``jax.distributed``.

The reference is single-machine *by construction*: its sampler streams and
barriers all bind 127.0.0.1 (reference: PaGraph/parallel/dataloader.py:34,
116,153) and gradient sync is single-node NCCL via torch DDP (reference:
examples/profile/pa_gcn.py:18-24).  The TPU-native story has no such limit:
one controller process per host, ``jax.distributed`` wires the hosts into a
single global device mesh, and the same compiled ``shard_map`` epoch used
single-process runs unchanged — gradient ``pmean`` and halo ``all_to_all``
ride ICI between chips of one slice and DCN between slices, inserted by the
compiler rather than hand-rolled NCCL/socket code.

Each host process:
  * loads (or deterministically regenerates) the same dataset and runs the
    same deterministic partitioner, so every process agrees on the global
    partition->device assignment without any metadata exchange;
  * materializes the heavy per-device arrays (feature caches, CSR shards)
    ONLY for its addressable devices (`place_dp` takes a row callback and
    jax's `make_array_from_callback` pulls just the local rows) — this is
    the host-DRAM-tier contract at multi-host scale: no host ever holds
    another host's feature shard;
  * dispatches the identical whole-epoch program; metrics come back fully
    replicated, so every process reads them locally.

On CPU (tests, dry runs) cross-process collectives use the gloo backend;
on real TPU slices jax.distributed picks up the TPU topology natively.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import numpy as np

_initialized = False


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int) -> None:
    """Join the global runtime. Call BEFORE any other jax use.

    On the CPU platform this selects gloo for cross-process collectives
    (the CPU analog of the reference's NCCL init, pa_gcn.py:18-24); on TPU
    the platform's native collectives are used automatically.
    """
    global _initialized
    if _initialized:
        return
    import jax

    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # config knob absent on this jaxlib: TPU-only collectives
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def local_dp_rows(mesh) -> list:
    """Global leading-axis rows owned by this process (one per local device
    in mesh order)."""
    import jax

    pid = jax.process_index()
    return [r for r, d in enumerate(mesh.devices.flat)
            if d.process_index == pid]


RowSource = Union[np.ndarray, Callable[[int], np.ndarray]]


def place_dp(rows: RowSource, mesh, *, shape: Optional[tuple] = None,
             dtype=None, axis_name: str = "dp"):
    """Build a leading-axis-sharded global array on ``mesh``.

    ``rows`` is either the full stacked host array ``[D, ...]`` (always fine
    single-process; fine multi-process when the stack is cheap) or a
    callback ``row(r) -> np.ndarray`` materializing one device's slice on
    demand — multi-process, only this process's rows are ever built, which
    is what keeps per-host DRAM at ``1/num_hosts`` of the total.
    ``shape``/``dtype`` are required in callback form.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    if callable(rows):
        if shape is None or dtype is None:
            raise ValueError("callback form needs shape= and dtype=")

        def cb(index):
            sl = index[0]
            got = [np.asarray(rows(r))[None] for r in
                   range(sl.start or 0, sl.stop, sl.step or 1)]
            if len(got) == 1:
                return got[0]          # view — skip the concatenate copy
                                       # (a multi-GB transient at rmat27)
            return np.concatenate(got, axis=0)

        return jax.make_array_from_callback(tuple(shape), sharding, cb)
    rows = np.asarray(rows)
    if jax.process_count() == 1:
        return jax.device_put(rows, sharding)
    return jax.make_array_from_callback(
        rows.shape, sharding, lambda index: rows[index])


def place_replicated(tree, mesh):
    """Replicate a pytree across every device of a (possibly multi-process)
    mesh. Single-process this is a plain sharded device_put."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put_leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda index: x[index])

    return jax.tree.map(put_leaf, tree)


def host_fold_key(base_key: np.ndarray, step: int) -> np.ndarray:
    """Derive a per-epoch key as HOST data.

    Multi-process jit requires device inputs to be global arrays; a key
    folded on one local device is committed there and would be rejected.
    Returning numpy keeps the input "fully replicated from host" — every
    process computes the identical value, jax broadcasts it for free.
    (Single-process on the axon tunnel we do the opposite — fold on device
    to keep H2D off the dispatch path, train/loop.py:343.)
    """
    import jax

    return np.asarray(jax.random.fold_in(np.asarray(base_key), step))


def spawn_local(worker: Sequence[str], num_processes: int,
                *, coordinator_port: int = 0,
                env_extra: Optional[dict] = None,
                timeout: Optional[float] = None,
                stdout_paths: Optional[Sequence[str]] = None) -> list:
    """Launch ``num_processes`` copies of a CLI locally (torchrun-style),
    injecting ``--coordinator/--num-processes/--process-id`` flags.  Used by
    ``cli.launch`` and the multi-host tests; on a real pod each host runs
    its own process and this helper is not needed.

    Returns the list of exit codes.
    """
    import os
    import socket
    import subprocess
    import sys

    if not coordinator_port:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        coordinator_port = s.getsockname()[1]
        s.close()
    coord = f"127.0.0.1:{coordinator_port}"
    env = dict(os.environ)
    # the parent may pin virtual-device XLA flags (tests do); each worker
    # decides its own device count via --cpu-devices
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    if env_extra:
        env.update(env_extra)
    outs = [open(stdout_paths[i], "w") if stdout_paths else None
            for i in range(num_processes)]
    procs = [
        subprocess.Popen(
            [sys.executable, *worker,
             "--coordinator", coord,
             "--num-processes", str(num_processes),
             "--process-id", str(i)],
            env=env, stdout=outs[i],
        )
        for i in range(num_processes)
    ]
    try:
        return [p.wait(timeout=timeout) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in outs:
            if f:
                f.close()
