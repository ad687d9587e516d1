"""Multi-host mesh initialization.

The reference is a single-process system (no distributed mode at all); the
TPU-native design scales the backend solvers (sharded GBA / PCG / pose graph)
over a `jax.sharding.Mesh`. On one host the mesh spans the local chips; on a
pod slice, `init_distributed` wires `jax.distributed.initialize` so every
host contributes its chips to ONE global mesh and the solvers' psum
collectives ride ICI (the per-iteration communication is a single reduced
camera system — see parallel/sharded_ba.py).

Environment-driven usage (standard TPU pod launch):

    from orb_slam2_tpu.parallel import distributed
    mesh = distributed.init_distributed()      # auto from TPU env vars
    system = SlamSystem(cfg, gba_mesh=mesh)

On GCE TPU VMs `jax.distributed.initialize()` discovers the coordinator
automatically; elsewhere pass coordinator_address/num_processes/process_id.
"""
from __future__ import annotations

import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     axis: str = "shard"):
    """Initialize multi-process JAX (if requested / detected) and return a
    1-D device mesh over ALL global devices, suitable for every sharded
    solver in orb_slam2_tpu.parallel."""
    import jax
    from jax.sharding import Mesh

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    elif coordinator_address is None and _looks_like_pod():
        # TPU pod slice: args are auto-discovered from the environment
        jax.distributed.initialize()

    return Mesh(np.array(jax.devices()), (axis,))


def _looks_like_pod() -> bool:
    import os
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES") or
                os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
