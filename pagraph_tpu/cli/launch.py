"""Local multi-process launcher (torchrun-style).

The reference spawns one trainer process per GPU with ``mp.spawn`` plus a
separate store-server process (reference: examples/profile/pa_gcn.py:157,
server/pa_server.py).  Here one *controller* process per host suffices; this
launcher spawns N of them on one machine — the single-machine stand-in for
an N-host pod, used by tests and dry runs.  On a real multi-host slice each
host starts its own process instead:

    # host i of N:
    python -m pagraph_tpu.cli.train ... \
        --coordinator host0:1234 --num-processes N --process-id i

Local usage (2 "hosts" x 2 virtual CPU chips each):

    python -m pagraph_tpu.cli.launch --nprocs 2 -- \
        python -m pagraph_tpu.cli.train --synthetic 2000 --cpu-devices 2 \
        --partition 4 --on-device --epochs 4
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        description="spawn N local pagraph_tpu processes",
        usage="%(prog)s --nprocs N -- python -m pagraph_tpu.cli.train ...",
    )
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--timeout", type=float, default=None,
                   help="per-process wait timeout in seconds")
    p.add_argument("worker", nargs=argparse.REMAINDER,
                   help="worker command after --; '--coordinator/"
                        "--num-processes/--process-id' are appended")
    args = p.parse_args(argv)
    worker = args.worker
    if worker and worker[0] == "--":
        worker = worker[1:]
    if not worker:
        p.error("need a worker command after --")
    if worker[0] == sys.executable or worker[0] == "python":
        worker = worker[1:]

    from pagraph_tpu.parallel.multihost import spawn_local

    codes = spawn_local(worker, args.nprocs, timeout=args.timeout)
    print(f"exit codes: {codes}", file=sys.stderr)
    return 0 if not any(codes) else 1


if __name__ == "__main__":
    sys.exit(main())
