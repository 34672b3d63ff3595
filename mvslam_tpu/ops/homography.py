"""Planar homography estimation (DLT, Hartley-normalized, batched).

Support op for camera calibration (Zhang's method) and planar-scene
handling. The reference has no standalone homography op — its calibration
app delegates wholesale to ``cv::calibrateCamera``
(``utility/calibrate-camera.cpp:77-215``); here the solve is our own.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.ops.epipolar import normalization_transform, _apply_transform2d

Array = jax.Array


def find_homography(p_src: Array, p_dst: Array, weights: Array) -> Array:
    """H with ``p_dst ~ H p_src`` from (..., N, 2) point sets, batched.

    Hartley-normalizes both sets, solves the 2N x 9 DLT by smallest
    eigenvector of the normal matrix, denormalizes ``T_dst^-1 H' T_src``,
    and scales so ``H[2,2] = 1``.
    """
    T1 = normalization_transform(p_src, weights)
    T2 = normalization_transform(p_dst, weights)
    q1 = _apply_transform2d(T1, p_src)
    q2 = _apply_transform2d(T2, p_dst)
    x, y = q1[..., 0], q1[..., 1]
    u, v = q2[..., 0], q2[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    # rows for u: [-x, -y, -1, 0, 0, 0, u x, u y, u]
    row_u = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    row_v = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([row_u, row_v], axis=-2)
    w2 = jnp.concatenate([weights, weights], axis=-1)
    A = A * w2[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    h = linalg.smallest_eigvec_psd(AtA)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T2) @ Hn @ T1
    scale = H[..., 2:3, 2:3]
    safe = jnp.where(jnp.abs(scale) < jnp.finfo(H.dtype).tiny, 1.0, scale)
    return H / safe


def homography_transfer_error_sq(H: Array, p_src: Array, p_dst: Array) -> Array:
    """Squared forward-transfer error per point, (..., N)."""
    ones = jnp.ones_like(p_src[..., :1])
    ph = jnp.concatenate([p_src, ones], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", H, ph)
    w = q[..., 2]
    safe_w = jnp.where(jnp.abs(w) < jnp.finfo(H.dtype).tiny, 1.0, w)
    proj = q[..., :2] / safe_w[..., None]
    return jnp.sum((proj - p_dst) ** 2, axis=-1)
