"""Shared synthetic-geometry fixtures.

Rebuild of the reference test machinery (``test/unit-test-helper.{hpp,cpp}``):
Gaussian samplers, random SE3 perturbations via exp of Gaussian twists, the
CUBE / L_SHAPE 8-point rigs, and tolerance-based SE3 comparison.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3, so3_from_rpy

CUBE = "cube"
L_SHAPE = "l_shape"

_RIGS = {
    # reference unit-test-helper.cpp:51-61
    CUBE: np.array(
        [
            [-1, -1, -1],
            [-1, -1, +1],
            [-1, +1, -1],
            [-1, +1, +1],
            [+1, -1, -1],
            [+1, -1, +1],
            [+1, +1, -1],
            [+1, +1, +1],
        ],
        dtype=np.float64,
    ),
    # reference unit-test-helper.cpp:62-72
    L_SHAPE: np.array(
        [
            [1, 0, 0],
            [0, 0, 0],
            [0, 2, 0],
            [1, 0, 3],
            [0, 0, 3],
            [0, 2, 3],
            [0.5, 0.0, 1.5],
            [0.0, 1.0, 1.5],
        ],
        dtype=np.float64,
    ),
}


def get_rig_points(rig_type, rotation=None, translation=(0.0, 0.0, 0.0),
                   scale=1.0, dtype=jnp.float64):
    """8-point rig transformed by ``R @ (scale * p) + t``
    (reference ``unit-test-helper.cpp:29-79``)."""
    pts = jnp.asarray(_RIGS[rig_type], dtype=dtype)
    t = jnp.asarray(translation, dtype=dtype)
    if rotation is None:
        rotation = jnp.eye(3, dtype=dtype)
    rotation = jnp.asarray(rotation, dtype=dtype)
    return (scale * pts) @ rotation.T + t


def rig_rotation(roll, pitch, yaw, dtype=jnp.float64):
    return so3_from_rpy(roll, pitch, yaw, dtype=dtype)


def random_se3(rng: np.random.Generator, stddev: float, dtype=jnp.float64) -> SE3:
    """Random SE3 = exp of an isotropic Gaussian twist
    (reference ``unit-test-helper.cpp:15-27``)."""
    xi = jnp.asarray(rng.normal(0.0, stddev, size=6), dtype=dtype)
    return SE3.exp(xi)


def check_similar_se3(T1: SE3, T2: SE3, tol: float) -> bool:
    """Componentwise |ln(T1) - ln(T2)| <= tol
    (reference ``unit-test-helper.cpp:81-96``)."""
    d = np.asarray(T1.log() - T2.log())
    return bool(np.all(np.abs(d) <= tol))


def se3_from_parts(R, t, dtype=None) -> SE3:
    R = jnp.asarray(R, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    return SE3(R, t)
