"""Batched two-view DLT triangulation with cheirality checks.

Rebuild of ``triangulate_points`` in the reference
(``vision/sfm-solve.cpp:134-227``, H&Z p312): per point, a 4x4 homogeneous
system built from both projection matrices, solved by the smallest
eigenvector of ``A^T A``. The reference loops point-by-point with a 4x4 SVD
each; here all N points (and any leading hypothesis axes) are solved in one
batched ``eigh``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import SE3

Array = jax.Array


def projection_matrix(pose: SE3) -> Array:
    """World->camera SE3 -> ideal-camera 3x4 projection matrix ``[R | t]``."""
    return pose.matrix3x4()


def triangulate_dlt(P1: Array, P2: Array, r1: Array, r2: Array) -> Array:
    """DLT triangulation of ray pairs against projection matrices.

    P1, P2: (..., 3, 4) ideal-camera projections; r1, r2: (..., N, 3)
    homogeneous image points (last coord 1). Returns (..., N, 3) world points.

    Points at infinity (homogeneous w ~ 0) are clamped rather than NaN'd;
    use :func:`cheirality_mask` to reject them.
    """
    x1, y1 = r1[..., 0], r1[..., 1]
    x2, y2 = r2[..., 0], r2[..., 1]

    def rows(P, x, y):
        # (..., N, 4) rows: x * P[2] - P[0],  y * P[2] - P[1]
        P0 = P[..., None, 0, :]
        P1_ = P[..., None, 1, :]
        P2_ = P[..., None, 2, :]
        return x[..., None] * P2_ - P0, y[..., None] * P2_ - P1_

    a0, a1 = rows(P1, x1, y1)
    a2, a3 = rows(P2, x2, y2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (..., N, 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    X_h = linalg.smallest_eigvec_psd(AtA)  # (..., N, 4)
    w = X_h[..., 3]
    safe_w = jnp.where(
        jnp.abs(w) < jnp.finfo(A.dtype).tiny ** 0.5,
        jnp.ones_like(w),
        w,
    )
    return X_h[..., :3] / safe_w[..., None]


def point_depth(P: Array, X: Array) -> Array:
    """Camera-frame z of world points under projection ``P = [R | t]``.

    P: (..., 3, 4); X: (..., N, 3) -> (..., N).
    """
    return (
        jnp.einsum("...j,...nj->...n", P[..., 2, :3], X) + P[..., None, 2, 3]
    )


def cheirality_mask(P1: Array, P2: Array, X: Array, min_depth=0.0) -> Array:
    """Points in front of both cameras (reference ``sfm-solve.cpp:205-218``)."""
    return jnp.logical_and(
        point_depth(P1, X) > min_depth, point_depth(P2, X) > min_depth
    )


def reprojection_error_sq(P: Array, X: Array, r: Array) -> Array:
    """Squared ideal-plane reprojection error per point, (..., N)."""
    z = point_depth(P, X)
    xy = (
        jnp.einsum("...ij,...nj->...ni", P[..., :2, :3], X)
        + P[..., None, :2, 3]
    )
    safe_z = jnp.where(jnp.abs(z) < jnp.finfo(X.dtype).tiny ** 0.5,
                       jnp.ones_like(z), z)
    proj = xy / safe_z[..., None]
    return jnp.sum((proj - r[..., :2]) ** 2, axis=-1)
