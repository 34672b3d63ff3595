"""Camera intrinsics calibration from planar targets (Zhang's method).

Our own rebuild of the numerical half of the reference's calibrate-camera
app (``utility/calibrate-camera.cpp:77-215``, which delegates to
``cv::calibrateCamera``): per-view homographies (our DLT), the absolute-
conic linear system for K, per-view extrinsics, and a joint Gauss-Newton
refinement of intrinsics + extrinsics over all reprojections. No lens
distortion — matching the reference's saved camera model, which is a pure
pinhole (fx, fy, shear, px, py; ``vision/camera.hpp:13-55``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3, so3_exp
from mvslam_tpu.ops.homography import find_homography

Array = jax.Array


class CalibrationResult(NamedTuple):
    K: Array                  # (3, 3) intrinsics
    extrinsics: SE3           # (V,) world->camera per view
    rms_error: Array          # pixels
    per_view_error: Array     # (V,)


def _vij(H: Array, i: int, j: int) -> Array:
    """Zhang's constraint vector v_ij from homography columns, batched."""
    h_i = H[..., :, i]
    h_j = H[..., :, j]
    return jnp.stack(
        [
            h_i[..., 0] * h_j[..., 0],
            h_i[..., 0] * h_j[..., 1] + h_i[..., 1] * h_j[..., 0],
            h_i[..., 1] * h_j[..., 1],
            h_i[..., 2] * h_j[..., 0] + h_i[..., 0] * h_j[..., 2],
            h_i[..., 2] * h_j[..., 1] + h_i[..., 1] * h_j[..., 2],
            h_i[..., 2] * h_j[..., 2],
        ],
        axis=-1,
    )


def _intrinsics_from_homographies(Hs: Array) -> Array:
    """K from >= 3 view homographies via the image of the absolute conic."""
    v12 = _vij(Hs, 0, 1)                       # (V, 6)
    v11 = _vij(Hs, 0, 0)
    v22 = _vij(Hs, 1, 1)
    Vmat = jnp.concatenate([v12, v11 - v22], axis=0)   # (2V, 6)
    # Pixel-scale homographies make this system wildly ill-scaled (entries
    # span ~1..1e6, so cond(V^T V) ~ 1e24): equalize row norms, then use the
    # exact eigh null-space extractor. Calibration is an offline app run
    # once per camera, not a hot kernel — the matmul-only amplification
    # solver cannot resolve a 1e-8 relative spectral gap and is wrong here.
    row_norm = jnp.linalg.norm(Vmat, axis=-1, keepdims=True)
    Vmat = Vmat / jnp.maximum(row_norm, jnp.finfo(Hs.dtype).tiny)
    from mvslam_tpu.math import linalg

    b = linalg.smallest_eigvec_psd_exact(Vmat.T @ Vmat)      # (6,)
    B11, B12, B22, B13, B23, B33 = b
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    gamma = -B12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha * alpha / lam
    return jnp.asarray(
        [[alpha, gamma, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]], Hs.dtype
    )


def _extrinsics_from_homography(K: Array, H: Array) -> SE3:
    """World (Z=0 plane) -> camera pose from K^-1 H, batched over views."""
    A = jnp.linalg.solve(K, H)                          # (..., 3, 3)
    lam = 1.0 / jnp.linalg.norm(A[..., :, 0], axis=-1)
    r1 = A[..., :, 0] * lam[..., None]
    r2 = A[..., :, 1] * lam[..., None]
    t = A[..., :, 2] * lam[..., None]
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=-1)
    # flip if the plane ended up behind the camera
    flip = jnp.where(t[..., 2] < 0, -1.0, 1.0)
    R = jnp.stack([r1 * flip[..., None], r2 * flip[..., None], r3], axis=-1)
    t = t * flip[..., None]
    # project to the closest rotation
    from mvslam_tpu.math import linalg

    R = linalg.project_to_so3(R)
    return SE3(R, t)


def _project(K: Array, poses: SE3, X: Array) -> Array:
    """Project shared (N, 3) board points through (V,) world->camera poses."""
    Xc = jnp.einsum("vij,nj->vni", poses.R, X) + poses.t[:, None, :]
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    xy = Xc[..., :2] / z[..., None]
    return (
        jnp.einsum("ij,vnj->vni", K[:2, :2], xy) + K[:2, 2][None, None, :]
    )


def calibrate_planar(
    board_points: Array,
    image_points: Array,
    weights: Array,
    refine_iterations: int = 10,
) -> CalibrationResult:
    """Full calibration from V views of a planar target.

    board_points: (N, 2) target-plane coordinates (Z = 0) shared by views;
    image_points: (V, N, 2) detected pixels; weights: (V, N) validity.
    """
    dtype = image_points.dtype
    V, N = image_points.shape[:2]
    bp = jnp.broadcast_to(board_points, (V, N, 2))
    Hs = find_homography(bp, image_points, weights)          # (V, 3, 3)
    K0 = _intrinsics_from_homographies(Hs)
    poses0 = _extrinsics_from_homography(K0, Hs)
    X = jnp.concatenate([board_points, jnp.zeros((N, 1), dtype)], axis=-1)

    # joint GN over [fx, fy, shear, u0, v0] + V * 6 extrinsics
    def unpack(theta):
        K = jnp.asarray(
            [[theta[0], theta[2], theta[3]],
             [0.0, theta[1], theta[4]],
             [0.0, 0.0, 1.0]], dtype,
        )
        xi = theta[5:].reshape(V, 6)
        poses = poses0.compose(SE3.exp(xi))
        return K, poses

    def residuals(theta):
        K, poses = unpack(theta)
        # poses here are world->camera: project X through pose directly
        proj = _project(K, poses, X)
        r = (proj - image_points) * weights[..., None]
        return r.reshape(-1)

    theta0 = jnp.concatenate(
        [jnp.asarray([K0[0, 0], K0[1, 1], K0[0, 1], K0[0, 2], K0[1, 2]], dtype),
         jnp.zeros((V * 6,), dtype)]
    )

    def gn_step(_, theta):
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        H = J.T @ J
        g = -J.T @ r
        jitter = 1e-8 * (1.0 + jnp.max(jnp.abs(H)))
        delta = jnp.linalg.solve(
            H + jitter * jnp.eye(H.shape[0], dtype=dtype), g
        )
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        new = theta + delta
        better = jnp.sum(residuals(new) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new, theta)

    theta = jax.lax.fori_loop(0, refine_iterations, gn_step, theta0)
    K, poses = unpack(theta)
    r = residuals(theta).reshape(V, N, 2)
    n_obs = jnp.maximum(jnp.sum(weights), 1.0)
    rms = jnp.sqrt(jnp.sum(r**2) / n_obs)
    per_view = jnp.sqrt(
        jnp.sum(r**2, axis=(1, 2)) / jnp.maximum(jnp.sum(weights, 1), 1.0)
    )
    return CalibrationResult(K=K, extrinsics=poses, rms_error=rms,
                             per_view_error=per_view)
