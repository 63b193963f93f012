"""Device-mesh helpers for data-parallel scale-out.

The reference has no parallelism of any kind (SURVEY.md §2: single process,
single device, one env). This layer is new capability: a 1-D 'data' mesh over
all local (or given) devices; multi-host extends the same mesh across
processes via jax.distributed (ICI within a slice, DCN across hosts), with
gradient reduction as a psum over the mesh axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def env_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard along the leading env axis (replay arrays, frame stacks,
    per-env vectors)."""
    return NamedSharding(mesh, P(axis_name))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
