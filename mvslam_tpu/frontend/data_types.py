"""Front-end data types: frames and id generation.

Rebuild of ``front-end/data-type.{hpp,cpp}``: ``Frame{id, capture_time,
visual_feature, image}`` with an atomic id generator. Frames are immutable
host objects holding device arrays; the heavy per-frame state is the
:class:`mvslam_tpu.ops.features.FeatureSet`.
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field
from typing import Optional

import jax

from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.ops.features import FeatureSet

Array = jax.Array

INVALID_ID = -1

_id_counter = itertools.count()
_id_lock = threading.Lock()


def generate_frame_id() -> int:
    """Monotonic unique frame id (reference ``front-end/data-type.cpp:7-12``,
    an atomic counter)."""
    with _id_lock:
        return next(_id_counter)


@dataclass(frozen=True)
class Frame:
    """One captured frame (reference ``front-end/data-type.hpp:11-38``)."""

    id: int
    capture_time: float
    features: FeatureSet
    rays: Array                      # (K, 3) ideal-camera homogeneous rays
    sigma: Array                     # (K,) measurement stddev in ideal units
    focal: float = 1.0               # sqrt(fx * fy): pixel <-> ideal scale
    camera: Optional[PinholeCamera] = field(default=None, repr=False)
    image: Optional[Array] = field(default=None, repr=False)
    image_smooth: Optional[Array] = field(default=None, repr=False)  # for KLT
