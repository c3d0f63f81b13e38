"""Device mesh setup for ray-sharded rendering.

The scalable axis of a raymarcher is rays/screen-tiles (SURVEY.md §2.8): the
octree pools are replicated per device, the ray batch shards across a 1-D
``rays`` mesh axis, and voxel-parameter gradients all-reduce over ICI.  The
per-ray march loop is inherently sequential and stays on-chip — that is the
explicit SP/CP mapping decision for this workload.

Multi-host: jax.distributed.initialize() (call init_distributed()) makes
jax.devices() span the slice; the same 1-D mesh then covers all hosts with
XLA routing collectives over ICI/DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS_AXIS = "rays"


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """1-D mesh over the ray axis. Defaults to all visible devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAYS_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Rays: first axis sharded across devices."""
    return NamedSharding(mesh, P(RAYS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op if already initialized or single-process)."""
    try:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment


__all__ = ["RAYS_AXIS", "make_mesh", "ray_sharding", "replicated", "init_distributed"]
