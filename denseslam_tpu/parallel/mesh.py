"""Device-mesh construction helpers.

The reference is single-process single-GPU (SURVEY.md section 2c P5 —
no distributed backend exists); distribution is a new first-class capability
here: one logical `map` axis shards the voxel-block table (and BA
landmarks), scaling fusion across chips/hosts over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MAP_AXIS = "map"


def make_map_mesh(n_devices: Optional[int] = None,
                  devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over the map axis. n_devices defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (MAP_AXIS,))


def map_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MAP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
