"""Epipolar geometry: Hartley-normalized 8-point solves for F and E.

Rebuild of the reference ``source/vision/fundamental-matrix.{hpp,cpp}`` and the
essential-matrix half of ``source/vision/sfm-solve.cpp`` — but batched: every
routine accepts a leading hypothesis axis so a whole RANSAC batch is one
fused XLA computation instead of the reference's per-iteration loop
(``vision/estimator-RANSAC.cpp:16-90``).

Point sets are fixed-capacity ``(N, 2|3)`` arrays with a boolean/float mask;
masked-out rows contribute zero rows to the DLT system, which leaves the
normal equations unchanged — the TPU-native replacement for dynamic point
counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg

Array = jax.Array


def normalization_transform(points: Array, weights: Array) -> Array:
    """Hartley conditioning transform for a weighted 2D point set.

    Translates the (weighted) centroid to the origin and scales the mean
    distance-from-centroid to sqrt(2) (reference
    ``find_normalization_transform``, ``vision/fundamental-matrix.cpp:18-54``).

    points: (..., N, 2); weights: (..., N) zero/one mask (or soft weights).
    Returns (..., 3, 3) homogeneous transforms.
    """
    dtype = points.dtype
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    wsum = jnp.maximum(wsum, jnp.asarray(1.0, dtype))
    centroid = jnp.sum(points * weights[..., None], axis=-2) / wsum
    d = jnp.linalg.norm(points - centroid[..., None, :], axis=-1)
    mean_dist = jnp.sum(d * weights, axis=-1) / wsum[..., 0]
    scale = jnp.sqrt(jnp.asarray(2.0, dtype)) / jnp.maximum(
        mean_dist, jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    )
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    T = jnp.stack(
        [
            jnp.stack([scale, zeros, -scale * centroid[..., 0]], axis=-1),
            jnp.stack([zeros, scale, -scale * centroid[..., 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return T


def _dlt_rows(p1: Array, p2: Array) -> Array:
    """Epipolar constraint rows: ``p2^T F p1 = 0`` with p = (x, y, 1).

    p1, p2: (..., N, 2) -> (..., N, 9) rows
    [x2 x1, x2 y1, x2, y2 x1, y2 y1, y2, x1, y1, 1]
    (reference ``vision/fundamental-matrix.cpp:96-117``).
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )


def _solve_epipolar_dlt(p1: Array, p2: Array, weights: Array) -> Array:
    """Weighted homogeneous solve of the epipolar DLT: (..., 3, 3) matrix
    with unspecified scale and no rank constraint applied yet."""
    A = _dlt_rows(p1, p2) * weights[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    f = linalg.smallest_eigvec_psd(AtA)
    return f.reshape(f.shape[:-1] + (3, 3))


def _apply_transform2d(T: Array, p: Array) -> Array:
    """Apply homogeneous 3x3 to 2D points (..., N, 2)."""
    return (
        jnp.einsum("...ij,...nj->...ni", T[..., :2, :2], p)
        + T[..., None, :2, 2]
    )


def find_fundamental_matrix(p1: Array, p2: Array, weights: Array) -> Array:
    """Hartley-normalized 8-point fundamental matrix, batched.

    Steps (reference ``find_fundamental_matrix_8point``,
    ``vision/fundamental-matrix.cpp:56-140``): condition both point sets,
    solve the DLT, re-impose rank 2 by zeroing the smallest singular value,
    denormalize as ``T2^T F' T1``, and fix the sign/scale so ``|F| = 1``
    with a deterministic sign.

    p1, p2: (..., N, 2) pixel coords; weights: (..., N).
    """
    T1 = normalization_transform(p1, weights)
    T2 = normalization_transform(p2, weights)
    q1 = _apply_transform2d(T1, p1)
    q2 = _apply_transform2d(T2, p2)
    F = _solve_epipolar_dlt(q1, q2, weights)
    # rank-2 projection: zero the smallest singular value
    U, s, Vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    F = (U * s[..., None, :]) @ Vt
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # normalize scale (the DLT fixes |f|=1 pre-denormalization only)
    norm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    return F / jnp.maximum(norm, jnp.finfo(F.dtype).tiny)


def find_essential_matrix(r1: Array, r2: Array, weights: Array) -> Array:
    """8-point essential matrix from *ideal-camera* rays, batched.

    Like :func:`find_fundamental_matrix` but re-imposes the essential-matrix
    structure: two equal singular values and a zero third,
    ``E = U diag(s, s, 0) V^T`` with ``s = (s1 + s2) / 2`` (reference
    ``find_essential_matrix``, ``vision/sfm-solve.cpp:62-90``).

    r1, r2: (..., N, 3) homogeneous rays with last coord 1 (or (..., N, 2)).
    """
    p1 = r1[..., :2]
    p2 = r2[..., :2]
    T1 = normalization_transform(p1, weights)
    T2 = normalization_transform(p2, weights)
    q1 = _apply_transform2d(T1, p1)
    q2 = _apply_transform2d(T2, p2)
    E = _solve_epipolar_dlt(q1, q2, weights)
    E = jnp.swapaxes(T2, -1, -2) @ E @ T1
    U, s, Vt = jnp.linalg.svd(E)
    s_mean = 0.5 * (s[..., 0] + s[..., 1])
    s_new = jnp.stack([s_mean, s_mean, jnp.zeros_like(s_mean)], axis=-1)
    E = (U * s_new[..., None, :]) @ Vt
    norm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    return E / jnp.maximum(norm, jnp.finfo(E.dtype).tiny)


def epipolar_residual(E: Array, r1: Array, r2: Array) -> Array:
    """Algebraic epipolar residual ``|r2^T E r1|`` per point.

    The reference's inlier statistic (``estimator-RANSAC.cpp:100-129``).
    E: (..., 3, 3); r1, r2: (..., N, 3) -> (..., N).
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, r1)
    return jnp.abs(jnp.sum(r2 * Er1, axis=-1))


def sampson_error(E: Array, r1: Array, r2: Array) -> Array:
    """First-order geometric (Sampson) error per point, (..., N).

    More selective than the algebraic residual for RANSAC scoring; this is
    what OpenCV's ``findEssentialMat`` thresholds internally (the reference
    delegates to it, ``vision/sfm-solve.cpp:51-60``).
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, r1)
    Etr2 = jnp.einsum("...ji,...nj->...ni", E, r2)
    num = jnp.sum(r2 * Er1, axis=-1) ** 2
    den = (
        Er1[..., 0] ** 2 + Er1[..., 1] ** 2
        + Etr2[..., 0] ** 2 + Etr2[..., 1] ** 2
    )
    return num / jnp.maximum(den, jnp.finfo(E.dtype).tiny)


def decompose_essential_matrix(E: Array) -> tuple[Array, Array]:
    """E -> 4 candidate (R, t) with ``|t| = 1`` (H&Z p258; reference
    ``decompose_essential_matrix``, ``vision/sfm-solve.cpp:97-127``).

    Returns (Rs, ts): (..., 4, 3, 3) and (..., 4, 3). Candidates are
    (R1, +t), (R1, -t), (R2, +t), (R2, -t) with ``R1 = U W V^T``,
    ``R2 = U W^T V^T`` made proper rotations.
    """
    U, _, Vt = jnp.linalg.svd(E)
    dtype = E.dtype
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype)
    # make U, V proper rotations so R below is a rotation
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U * jnp.where(detU < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)[..., None, None]
    R1 = U @ W @ Vt
    R2 = U @ jnp.swapaxes(W, -1, -2) @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts
