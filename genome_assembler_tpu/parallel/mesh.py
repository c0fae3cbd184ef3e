"""Device mesh helpers (SURVEY.md §5 distributed backend).

All distribution rides ``jax.sharding.Mesh`` + ``shard_map`` with XLA
collectives — no hand-written transport. One logical axis ``d`` spans every
chip; XLA lowers intra-slice traffic to ICI and cross-host traffic to DCN.
Tests run the same code on a forced multi-device CPU platform
(``--xla_force_host_platform_device_count``), so pod-slice runs are a config
change, not a code change (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(num_devices: int | None = None, axis: str = "d") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} present"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def row_sharding(mesh: Mesh, axis: str = "d") -> NamedSharding:
    """Shard the leading (read-batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
