"""Mesh construction and multi-host initialization helpers.

The TPU-native communication layer (SURVEY.md §5.8): jax.distributed for
multi-host bring-up, a 1-D ``points`` mesh axis for sharded BA (point
blocks ride ICI within a slice, DCN across hosts — XLA picks the
transport from the mesh), with a single-device fallback.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POINTS_AXIS = "points"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host runs. No-op when the
    environment provides no coordinator (single-host)."""
    coordinator = coordinator or os.environ.get("MVO_COORDINATOR")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("MVO_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("MVO_PROCESS_ID", "0")),
    )


def points_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over (up to) all devices for point-block sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (POINTS_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def points_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(POINTS_AXIS))
