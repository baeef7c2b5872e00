"""Multi-host (DCN) initialization for pod-slice deployments.

The reference's inter-process transport is localhost UDP
(SURVEY.md §2.2 P5); at pod scale the equivalent split is:

- intra-slice: XLA collectives over ICI (the `ppermute` halos and
  `psum` clock agreement inside `parallel.sharded`);
- inter-host: the JAX distributed runtime over DCN for process
  coordination, plus the `trx.protocol` planes at the framework edge.

`initialize()` wires `jax.distributed` from standard environment
variables so the same `sharded_uplink_pipeline` program spans all
hosts' devices; each host feeds its local shard of channels/time blocks
(`host_local_shard`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (idempotent, no-op for a
    single process).

    Defaults come from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (or their standard cluster envs).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def host_local_shard(global_array_shape: tuple[int, ...],
                     mesh: jax.sharding.Mesh):
    """Describe which slice of the global [chan, time] sample stream
    this host must provide: (chan_slice, time_slice) based on the
    mesh's local devices."""
    local = set(jax.local_devices())
    rows = sorted({i for i in range(mesh.devices.shape[0])
                   if any(d in local for d in mesh.devices[i])})
    cols = sorted({j for j in range(mesh.devices.shape[1])
                   if any(d in local for d in mesh.devices[:, j])})
    c_total, t_total = global_array_shape
    c_per = c_total // mesh.devices.shape[0]
    t_per = t_total // mesh.devices.shape[1]
    return (slice(rows[0] * c_per, (rows[-1] + 1) * c_per),
            slice(cols[0] * t_per, (cols[-1] + 1) * t_per))
