"""Meshes, sharding and halo collectives.

Replaces the reference's thread/UDP parallelism (SURVEY.md §2.2) with
XLA collectives over a device mesh:

- P2 (per-timeslot/ARFCN data parallelism) → the `chan` mesh axis;
- P3 (overlap-save streaming across chunk boundaries,
  Transceiver/radioInterface.cpp:123-260) → the `time` mesh axis with
  `ppermute` halo exchange of FIR boundary samples;
- P6 (clock distribution, IND CLOCK) → deterministic block-index math
  plus a `psum`-based agreement check.
"""

from openbts_ttsou_tpu.parallel.mesh import make_mesh, mesh_factors  # noqa: F401
from openbts_ttsou_tpu.parallel.halo import exchange_halo, resample_block  # noqa: F401
from openbts_ttsou_tpu.parallel.sharded import (  # noqa: F401
    sharded_duplex_pipeline,
    sharded_uplink_pipeline,
    state_partition_specs,
)
