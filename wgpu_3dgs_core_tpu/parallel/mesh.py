"""Device mesh helpers for multi-chip/multi-host scaling.

The reference has no distributed layer (SURVEY.md §2.3); this is the
TPU-native addition demanded by the north star: gaussians sharded over a
1D "data" mesh axis, tiles strip-partitioned over the same axis, XLA
collectives over ICI/DCN. Multi-host initialization goes through
``jax.distributed.initialize`` before building the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def gaussian_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (gaussian) axis over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad an array along ``axis`` so shards divide evenly."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(x), widths), n
