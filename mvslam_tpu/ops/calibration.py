"""Camera intrinsics calibration from planar targets (Zhang's method).

Our own rebuild of the numerical half of the reference's calibrate-camera
app (``utility/calibrate-camera.cpp:77-215``, which delegates to
``cv::calibrateCamera``): per-view homographies (our DLT), the absolute-
conic linear system for K, per-view extrinsics, and a joint Gauss-Newton
refinement of intrinsics + extrinsics over all reprojections. Radial lens
distortion (k1, k2) is estimated jointly when asked
(``estimate_distortion=True``) — the reference's calibrate-camera also
estimates distortion coefficients and undistorts with them
(``utility/calibrate-camera.cpp:171-186,208``); the reference's SAVED
camera model stays a pure pinhole (fx, fy, shear, px, py;
``vision/camera.hpp:13-55``), so the distortion lives in the calibration
result and the :func:`undistort_points` / :func:`undistort_image` ops, not
in :class:`~mvslam_tpu.ops.camera.PinholeCamera`.
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
    dist: Array | None = None  # (2,) radial (k1, k2); None if not estimated


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


def distort_normalized(xy: Array, dist: Array) -> Array:
    """Apply radial distortion ``x' = x (1 + k1 r^2 + k2 r^4)`` to ideal
    (normalized) image coordinates ``xy (..., 2)``; ``dist = (k1, k2)``."""
    r2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    return xy * (1.0 + dist[0] * r2 + dist[1] * r2 * r2)


def _project(K: Array, poses: SE3, X: Array,
             dist: Array | None = None) -> Array:
    """Project shared (N, 3) board points through (V,) world->camera poses
    (with optional radial distortion applied in normalized coordinates)."""
    Xc = jnp.einsum("vij,nj->vni", poses.R, X) + poses.t[:, None, :]
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    xy = Xc[..., :2] / z[..., None]
    if dist is not None:
        xy = distort_normalized(xy, dist)
    return (
        jnp.einsum("ij,vnj->vni", K[:2, :2], xy) + K[:2, 2][None, None, :]
    )


def undistort_points(pts: Array, K: Array, dist: Array,
                     iterations: int = 8) -> Array:
    """Distorted pixels ``(..., 2)`` -> undistorted pixels under the same K.

    Inverts the radial model by fixed-point iteration in normalized
    coordinates: ``x_{n+1} = x_d / (1 + k1 r_n^2 + k2 r_n^4)`` — the
    standard inversion (converges for |k r^2| < 1, i.e. any physically
    sane lens over its own field of view). The TPU-native shape of the
    reference's ``cv::undistort`` half of ``calibrate-camera.cpp:208``.
    """
    dtype = pts.dtype
    fxy = jnp.asarray([K[0, 0], K[1, 1]], dtype)
    cxy = jnp.asarray([K[0, 2], K[1, 2]], dtype)
    shear = K[0, 1]
    # pixel -> normalized (invert [[fx, s], [0, fy]])
    yn = (pts[..., 1] - cxy[1]) / fxy[1]
    xn = (pts[..., 0] - cxy[0] - shear * yn) / fxy[0]
    xd = jnp.stack([xn, yn], axis=-1)

    def body(_, x):
        r2 = jnp.sum(x * x, axis=-1, keepdims=True)
        return xd / (1.0 + dist[0] * r2 + dist[1] * r2 * r2)

    xu = jax.lax.fori_loop(0, iterations, body, xd)
    u = fxy[0] * xu[..., 0] + shear * xu[..., 1] + cxy[0]
    v = fxy[1] * xu[..., 1] + cxy[1]
    return jnp.stack([u, v], axis=-1)


def undistort_image(img: Array, K: Array, dist: Array) -> Array:
    """Resample a distorted ``(H, W)`` image onto the undistorted grid
    (bilinear; out-of-image samples clamp to the border — the preview the
    reference shows after calibration, ``calibrate-camera.cpp:199-213``).

    For each UNDISTORTED output pixel we distort its ray to find where the
    lens imaged it (the forward model — no iteration needed here).
    """
    dtype = img.dtype
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=dtype),
                          jnp.arange(W, dtype=dtype), indexing="ij")
    fxy = jnp.asarray([K[0, 0], K[1, 1]], dtype)
    cxy = jnp.asarray([K[0, 2], K[1, 2]], dtype)
    shear = K[0, 1]
    yn = (yy - cxy[1]) / fxy[1]
    xn = (xx - cxy[0] - shear * yn) / fxy[0]
    xyd = distort_normalized(jnp.stack([xn, yn], axis=-1), dist)
    u = fxy[0] * xyd[..., 0] + shear * xyd[..., 1] + cxy[0]
    v = fxy[1] * xyd[..., 1] + cxy[1]
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    u0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    du = (u - u0).astype(dtype)
    dv = (v - v0).astype(dtype)
    p00 = img[v0, u0]
    p01 = img[v0, u0 + 1]
    p10 = img[v0 + 1, u0]
    p11 = img[v0 + 1, u0 + 1]
    return ((1 - dv) * ((1 - du) * p00 + du * p01)
            + dv * ((1 - du) * p10 + du * p11))


def calibrate_planar(
    board_points: Array,
    image_points: Array,
    weights: Array,
    refine_iterations: int = 10,
    estimate_distortion: bool = False,
) -> CalibrationResult:
    """Full calibration from V views of a planar target.

    board_points: (N, 2) target-plane coordinates (Z = 0) shared by views;
    image_points: (V, N, 2) detected pixels; weights: (V, N) validity.
    ``estimate_distortion=True`` additionally estimates radial (k1, k2)
    jointly with intrinsics/extrinsics (reference parity:
    ``calibrate-camera.cpp:171-186`` estimates distortion too); the
    homography/conic initialization stays distortion-free — standard
    Zhang: distortion starts at 0 and is resolved by the joint refine.
    """
    dtype = image_points.dtype
    V, N = image_points.shape[:2]
    bp = jnp.broadcast_to(board_points, (V, N, 2))
    Hs = find_homography(bp, image_points, weights)          # (V, 3, 3)
    K0 = _intrinsics_from_homographies(Hs)
    poses0 = _extrinsics_from_homography(K0, Hs)
    X = jnp.concatenate([board_points, jnp.zeros((N, 1), dtype)], axis=-1)
    n_dist = 2 if estimate_distortion else 0

    # joint GN over [fx, fy, shear, u0, v0] (+ [k1, k2]) + V * 6 extrinsics
    def unpack(theta):
        K = jnp.asarray(
            [[theta[0], theta[2], theta[3]],
             [0.0, theta[1], theta[4]],
             [0.0, 0.0, 1.0]], dtype,
        )
        dist = theta[5:5 + n_dist] if estimate_distortion else None
        xi = theta[5 + n_dist:].reshape(V, 6)
        poses = poses0.compose(SE3.exp(xi))
        return K, dist, poses

    def residuals(theta):
        K, dist, poses = unpack(theta)
        # poses here are world->camera: project X through pose directly
        proj = _project(K, poses, X, dist)
        r = (proj - image_points) * weights[..., None]
        return r.reshape(-1)

    theta0 = jnp.concatenate(
        [jnp.asarray([K0[0, 0], K0[1, 1], K0[0, 1], K0[0, 2], K0[1, 2]], dtype),
         jnp.zeros((n_dist + V * 6,), dtype)]
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
    K, dist, poses = unpack(theta)
    r = residuals(theta).reshape(V, N, 2)
    n_obs = jnp.maximum(jnp.sum(weights), 1.0)
    rms = jnp.sqrt(jnp.sum(r**2) / n_obs)
    per_view = jnp.sqrt(
        jnp.sum(r**2, axis=(1, 2)) / jnp.maximum(jnp.sum(weights, 1), 1.0)
    )
    return CalibrationResult(K=K, extrinsics=poses, rms_error=rms,
                             per_view_error=per_view, dist=dist)
