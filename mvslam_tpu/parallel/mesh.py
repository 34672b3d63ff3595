"""Device mesh construction and sharding helpers.

No reference equivalent (the reference is single-process CPU, SURVEY §2.8);
this is the TPU-native scaling layer: a 1-D (or (hosts, devices)) mesh whose
``data`` axis shards landmarks/observations/keyframe blocks, with XLA
collectives over ICI doing all cross-shard coupling.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
