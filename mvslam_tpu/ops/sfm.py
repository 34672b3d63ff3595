"""Two-view structure from motion: bootstrap solve + triangulation.

Rebuild of ``sfm_solve`` / ``sfm_triangulate`` (reference
``vision/sfm-solve.cpp:232-394``, API at ``vision/sfm.hpp:30-76``) as one
fused, statically-shaped jit program:

    rays -> batched 8-point E-RANSAC -> decompose E (4 candidates)
         -> triangulate ALL candidates in one batch -> cheirality vote
         -> pose2in1 (unit-scale translation) + masked point set

The reference triangulates the 4 (R, t) candidates sequentially with
per-point SVD loops (``sfm-solve.cpp:232-284``); here candidates form a
batch axis of 4 and points a batch axis of N, so the whole recovery is a
couple of batched eighs on the MXU/VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import epipolar, ransac, triangulate

Array = jax.Array

#: reference constants (vision/sfm-solve.cpp:18-23)
MAX_ERROR_SQ = 5e-2
VF_MATCH_INLIER_MIN = 8


class SfmParams(NamedTuple):
    """Static solve configuration (shapes/budgets must be Python ints)."""

    num_hypotheses: int = 256
    threshold_sq: float = MAX_ERROR_SQ   # squared ideal-plane units
    min_inliers: int = VF_MATCH_INLIER_MIN
    min_depth: float = 0.0               # cheirality lower bound
    refit: bool = True


class SfmResult(NamedTuple):
    """Everything ``sfm_solve`` recovers. All shapes static.

    ``pose2in1``: frame-2 camera pose expressed in frame 1 (camera-to-world
    for world = frame-1 camera), translation unit-norm (scale is
    unobservable; reference ``sfm-solve.cpp:338-344``).
    ``points``: (N, 3) in frame-1 coordinates; rows valid where
    ``point_mask``. ``success``: enough inliers survived (reference's
    boolean return).
    """

    pose2in1: SE3
    points: Array
    point_mask: Array
    inlier_mask: Array
    num_inliers: Array
    num_points: Array
    E: Array
    success: Array


def recover_pose_and_points(
    E: Array,
    r1: Array,
    r2: Array,
    inlier_mask: Array,
    min_depth: float = 0.0,
) -> tuple[SE3, Array, Array]:
    """Choose among the 4 (R, t) decompositions of E by cheirality vote.

    Returns (pose2in1, points (N, 3) in frame 1, point_mask). Mirrors
    ``recover_pose_and_points`` (``sfm-solve.cpp:232-284``; H&Z p258) but
    triangulates all four candidates as one batch.
    """
    Rs, ts = epipolar.decompose_essential_matrix(E)   # (4,3,3), (4,3)
    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), dtype=E.dtype)], axis=-1
    )
    P1s = jnp.broadcast_to(P1, (4, 3, 4))
    P2s = jnp.concatenate([Rs, ts[..., None]], axis=-1)  # (4, 3, 4)

    X = triangulate.triangulate_dlt(P1s, P2s, r1[None], r2[None])  # (4, N, 3)
    front = triangulate.cheirality_mask(P1s, P2s, X, min_depth)     # (4, N)
    good = jnp.logical_and(front, inlier_mask[None, :])
    votes = jnp.sum(good, axis=-1)                                   # (4,)
    best = jnp.argmax(votes)

    R, t = Rs[best], ts[best]
    points = X[best]
    point_mask = good[best]
    # P2 = [R | t] maps frame-1 coords to camera 2; the *pose* of camera 2
    # in frame 1 is its inverse.
    pose2in1 = SE3(R, t).inverse()
    return pose2in1, points, point_mask


def sfm_solve(
    r1: Array,
    r2: Array,
    mask: Array,
    key: Array,
    params: SfmParams = SfmParams(),
) -> SfmResult:
    """Two-view bootstrap from matched ideal-camera rays.

    r1, r2: (N, 3) homogeneous rays (last coord 1); mask: (N,) validity of
    each match; key: PRNG key for hypothesis sampling.

    Reference ``sfm_solve`` (``vision/sfm-solve.cpp:285-368``): essential
    matrix by RANSAC, minimum inlier gate, pose/points by cheirality vote.
    """
    rr = ransac.essential_ransac(
        r1,
        r2,
        mask,
        key,
        num_hypotheses=params.num_hypotheses,
        threshold_sq=params.threshold_sq,
        refit=params.refit,
    )
    pose2in1, points, point_mask = recover_pose_and_points(
        rr.model, r1, r2, rr.inlier_mask, params.min_depth
    )
    success = rr.num_inliers >= params.min_inliers
    return SfmResult(
        pose2in1=pose2in1,
        points=points,
        point_mask=point_mask,
        inlier_mask=rr.inlier_mask,
        num_inliers=rr.num_inliers,
        num_points=jnp.sum(point_mask).astype(jnp.int32),
        E=rr.model,
        success=success,
    )


def sfm_triangulate(
    r1: Array,
    r2: Array,
    mask: Array,
    pose2in1: SE3,
    min_depth: float = 0.0,
) -> tuple[Array, Array]:
    """Triangulate matched rays under a *known* relative pose.

    Reference ``sfm_triangulate`` (``vision/sfm-solve.cpp:370-394``).
    Returns (points (N, 3) in frame 1, point_mask) — masked by input
    validity and cheirality in both cameras.
    """
    dtype = r1.dtype
    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1
    )
    P2 = pose2in1.inverse().matrix3x4()
    X = triangulate.triangulate_dlt(P1, P2, r1, r2)
    front = triangulate.cheirality_mask(P1, P2, X, min_depth)
    return X, jnp.logical_and(front, mask)
