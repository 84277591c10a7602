"""Multi-host (multi-process) execution layer.

The reference is a single-node program (SURVEY.md §5.8: "distributed
communication backend: none"); scaling past one host is a first-class
NEW capability of the TPU build (BASELINE config 5: N>=2 hosts,
cross-host bucket reduction, all-to-all NTT over DCN).

Design: multi-controller JAX. Every process
  1. calls `initialize()` (jax.distributed: one coordinator, N
     processes — on TPU pods the runtime wires ICI/DCN topology),
  2. opens the SAME .zkey/.wtns files (each host reads its copy, the
     analogue of the reference mmap-ing the zkey per process),
  3. builds the global mesh over all devices of all processes and runs
     the standard mesh prover (parallel/pmsm, parallel/pntt) — XLA
     partitions collectives over ICI within a host/slice and DCN
     across hosts from the same shard_map program.

Host arrays become global sharded arrays with
`jax.make_array_from_callback`: each process materializes ONLY its
addressable shards (a 2^24 zkey's tables never exist whole in any
single device memory — SURVEY.md §7 hard part (f)).

Tested without a pod via 2-process CPU simulation (SURVEY.md §4):
tests/test_multihost.py spawns two processes with 4 virtual CPU
devices each and proves sqchain bit-identically to the golden model.
"""

from __future__ import annotations

import os

import numpy as np

AXIS = "shard"


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire this process into the job. No-op for single-process runs.

    Values default from RSTPU_COORD / RSTPU_NPROCS / RSTPU_PROC_ID
    (explicit args win). On real multi-host TPU pods all three can be
    omitted entirely — jax.distributed auto-detects the topology."""
    import jax

    coordinator = coordinator or os.environ.get("RSTPU_COORD")
    if num_processes is None:
        num_processes = int(os.environ.get("RSTPU_NPROCS", "0")) or None
    if process_id is None:
        pid = os.environ.get("RSTPU_PROC_ID")
        process_id = int(pid) if pid is not None else None
    if num_processes in (None, 1) and coordinator is None:
        return  # single process
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = AXIS):
    """1-D mesh over every device of every process, ICI-major order
    (jax.devices() enumerates local-slice devices contiguously, so a
    contiguous point-axis shard maps neighbor exchanges onto ICI and
    only the coarse boundaries onto DCN)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def put_sharded(arr, mesh, spec):
    """Host array -> global device array with NamedSharding(mesh, spec).

    Single-process: plain device_put. Multi-process: each process
    materializes only its addressable shards from its local copy of the
    host array (every host loads the same zkey file)."""
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sh)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])


def replicate(arr, mesh):
    """Host array -> fully-replicated global array (every process must
    pass the same value — witness rows, twiddle tables)."""
    from jax.sharding import PartitionSpec as P

    return put_sharded(arr, mesh, P())
