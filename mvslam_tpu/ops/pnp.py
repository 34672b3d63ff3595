"""Perspective-n-Point: camera pose from 3D-2D correspondences.

Rebuild of ``pnp_solve`` / ``pnp_refine`` (reference
``vision/pnp-solve.cpp:16-104``, ``vision/pnp-refine.cpp:16-108``). The
reference delegates to ``cv::solvePnPRansac`` (P3P, 100 iterations); the
TPU-native design runs a batched-hypothesis RANSAC over a closed-form
Grunert P3P minimal solver (``ops/p3p.py`` — planar-safe, scalar algebra
per hypothesis, all hypotheses and all 4 root candidates scored in one
batched pass), then a linear 6+-point DLT refit on the consensus set
(guarded: a planar consensus set simply loses the inlier comparison) and a
fixed-iteration Gauss-Newton geometric polish.

Pose convention: returned poses are camera-to-world (the pose of the camera
in the world/map frame), matching the reference's ``pose`` output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import SE3, skew
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import p3p as p3p_mod
from mvslam_tpu.ops import ransac as ransac_mod

Array = jax.Array

#: reference constants (vision/pnp-solve.cpp:13-14,47-49)
PNP_POINT_MIN = 7
PNP_REPROJ_THRESHOLD = 0.05


class PnpParams(NamedTuple):
    num_hypotheses: int = 256
    threshold: float = PNP_REPROJ_THRESHOLD   # ideal-plane reprojection
    min_inliers: int = PNP_POINT_MIN
    refit: bool = True


class PnpResult(NamedTuple):
    pose: SE3                 # camera-to-world
    inlier_mask: Array        # (N,)
    num_inliers: Array
    success: Array


def _pose_dlt(X: Array, r: Array, weights: Array) -> tuple[Array, Array]:
    """Linear camera resection: world points -> projection ``P = [R~ | t~]``.

    X: (..., N, 3) world points; r: (..., N, 3) homogeneous image points;
    weights: (..., N). Each point contributes the two DLT rows of
    ``x (P3 . X) - (P1 . X) = 0`` / ``y (P3 . X) - (P2 . X) = 0``.
    Both point sets are Hartley-conditioned first (centroid to origin, mean
    distance to sqrt(dim)) — without this the 12x12 normal matrix is too
    ill-conditioned for f32. Returns (R_raw (..., 3, 3), t_raw (..., 3)) up
    to scale/sign.
    """
    dtype = X.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1.0)
    # world conditioning: Xn = sw * (X - cw)
    cw = jnp.sum(X * weights[..., None], axis=-2) / wsum
    dw = jnp.linalg.norm(X - cw[..., None, :], axis=-1)
    sw = jnp.sqrt(jnp.asarray(3.0, dtype)) / jnp.maximum(
        jnp.sum(dw * weights, axis=-1) / wsum[..., 0], tiny
    )
    Xn = (X - cw[..., None, :]) * sw[..., None, None]
    # image conditioning: rn = si * (xy - ci)
    xy = r[..., :2]
    ci = jnp.sum(xy * weights[..., None], axis=-2) / wsum
    di = jnp.linalg.norm(xy - ci[..., None, :], axis=-1)
    si = jnp.sqrt(jnp.asarray(2.0, dtype)) / jnp.maximum(
        jnp.sum(di * weights, axis=-1) / wsum[..., 0], tiny
    )
    xyn = (xy - ci[..., None, :]) * si[..., None, None]

    ones = jnp.ones_like(Xn[..., :1])
    Xh = jnp.concatenate([Xn, ones], axis=-1)                    # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    x = xyn[..., 0:1]
    y = xyn[..., 1:2]
    row_x = jnp.concatenate([-Xh, zeros, x * Xh], axis=-1)        # (..., N, 12)
    row_y = jnp.concatenate([zeros, -Xh, y * Xh], axis=-1)
    A = jnp.concatenate([row_x, row_y], axis=-2)                  # (..., 2N, 12)
    w2 = jnp.concatenate([weights, weights], axis=-1)
    A = A * w2[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    p = linalg.smallest_eigvec_psd(AtA)                           # (..., 12)
    Pn = p.reshape(p.shape[:-1] + (3, 4))
    # undo conditioning: P = T_img^-1 Pn T_world with
    # T_world = [[sw I, -sw cw], [0, 1]], T_img^-1 = [[I/si, ci], [0, 1]]
    M = Pn[..., :3] * sw[..., None, None]                         # x world scale
    b = Pn[..., 3] - jnp.einsum("...ij,...j->...i", Pn[..., :3], sw[..., None] * cw)
    inv_si = 1.0 / si
    row3_M = M[..., 2, :]
    row3_b = b[..., 2]
    R_raw = jnp.concatenate(
        [
            (M[..., :2, :] * inv_si[..., None, None]
             + ci[..., :, None] * row3_M[..., None, :]),
            row3_M[..., None, :],
        ],
        axis=-2,
    )
    t_raw = jnp.concatenate(
        [
            b[..., :2] * inv_si[..., None] + ci * row3_b[..., None],
            row3_b[..., None],
        ],
        axis=-1,
    )
    return R_raw, t_raw


def _pose_from_dlt(R_raw: Array, t_raw: Array, X: Array, weights: Array) -> SE3:
    """Fix scale/sign of a raw DLT projection and project onto SE(3).

    Scale = mean singular value of the rotation block; sign chosen so the
    (weighted) mean depth of the points is positive (cheirality).
    """
    # One Newton-polar factorization R_raw = Q H covers both sign choices:
    # polar(f * R_raw) = (f * Q, H), mean singular value = trace(H)/3, and
    # the nearest *rotation* to f*R_raw is f*Q when det(f*Q) > 0, else
    # f*Q*(I - 2 v v^T) with v the smallest eigenvector of H (the batched
    # SVDs this replaces dominated the PnP-RANSAC cost on TPU).
    dtype = R_raw.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    Q = linalg.polar_orthogonal(R_raw)
    H = jnp.swapaxes(Q, -1, -2) @ R_raw
    scale = jnp.trace(H, axis1=-2, axis2=-1) / 3.0
    _, v = linalg.eigh3x3_smallest(0.5 * (H + jnp.swapaxes(H, -1, -2)))
    flip_R = (
        jnp.eye(3, dtype=dtype) - 2.0 * v[..., :, None] * v[..., None, :]
    )
    detQ = jnp.linalg.det(Q)

    def nearest_rotation(f):
        Qf = Q * f[..., None, None]
        return jnp.where(
            (detQ * f > 0)[..., None, None], Qf, Qf @ flip_R
        )

    ones = jnp.ones(R_raw.shape[:-2], dtype)
    R = nearest_rotation(ones)
    t = t_raw / jnp.maximum(scale, tiny)[..., None]
    depth = (
        jnp.einsum("...j,...nj->...n", R[..., 2, :], X) + t[..., None, 2]
    )
    mean_depth = jnp.sum(depth * weights, axis=-1)
    flip = jnp.where(mean_depth < 0, -ones, ones)
    # [R|t] and [-R|-t] project identically up to sign of depth: re-project
    # with the sign applied to the raw blocks (same Q, H)
    R = nearest_rotation(flip)
    t = (t_raw * flip[..., None]) / jnp.maximum(scale, tiny)[..., None]
    # world-to-camera [R|t] -> camera-to-world pose
    return SE3(R, t).inverse()


def refine_pose_gn(
    pose: SE3, X: Array, r: Array, weights: Array, iterations: int = 3
) -> SE3:
    """Fixed-iteration pose-only Gauss-Newton on reprojection residuals.

    Polishes a linear DLT estimate to the measurement noise floor (the DLT
    minimizes an algebraic, not geometric, cost). 6x6 normal equations,
    batched over any leading pose dims; zero-weight-safe via jitter.
    """
    dtype = X.dtype

    def step(_, pose_Rt):
        pose_i = SE3(*pose_Rt)
        Xc = pose_i.inverse().apply(X)
        z = Xc[..., 2]
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        safe_z = jnp.where(jnp.abs(z) < 1e3 * eps, 1e3 * eps, z)
        inv_z = 1.0 / safe_z
        res = (Xc[..., :2] * inv_z[..., None] - r[..., :2]) * weights[..., None]
        zero = jnp.zeros_like(inv_z)
        dproj = jnp.stack(
            [
                jnp.stack([inv_z, zero, -Xc[..., 0] * inv_z * inv_z], axis=-1),
                jnp.stack([zero, inv_z, -Xc[..., 1] * inv_z * inv_z], axis=-1),
            ],
            axis=-2,
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Xc.shape + (3,))
        J = jnp.concatenate([dproj @ (-eye), dproj @ skew(Xc)], axis=-1)
        J = J * weights[..., None, None]
        H = jnp.einsum("...nki,...nkj->...ij", J, J)
        g = -jnp.einsum("...nki,...nk->...i", J, res)
        jitter = jnp.asarray(jnp.finfo(dtype).eps, dtype) * (
            1.0 + jnp.max(jnp.abs(H), axis=(-2, -1))
        )
        Hj = H + jitter[..., None, None] * jnp.eye(6, dtype=dtype)
        delta = linalg.solve_psd(Hj, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        new = pose_i.compose(SE3.exp(delta))
        return (new.R, new.t)

    R, t = jax.lax.fori_loop(0, iterations, step, (pose.R, pose.t))
    return SE3(R, t)


def reprojection_error_sq(pose: SE3, X: Array, r: Array) -> Array:
    """Squared ideal-plane reprojection error of world points under a
    camera-to-world pose. (..., N)."""
    Xc = pose.inverse().apply(X)
    z = Xc[..., 2]
    eps = jnp.asarray(jnp.finfo(X.dtype).eps, X.dtype)
    safe_z = jnp.where(jnp.abs(z) < 1e3 * eps, 1e3 * eps, z)
    proj = Xc[..., :2] / safe_z[..., None]
    err = jnp.sum((proj - r[..., :2]) ** 2, axis=-1)
    # behind-camera points can reproject anywhere: treat as gross errors
    return jnp.where(z > 0, err, jnp.asarray(jnp.inf, X.dtype))


def pnp_ransac_core(
    X: Array,
    r: Array,
    mask: Array,
    key: Array,
    num_hypotheses: int,
    thr_sq,
    refit: bool = True,
) -> tuple[SE3, Array]:
    """P3P-RANSAC + guarded DLT refit + Gauss-Newton polish.

    ``thr_sq`` may be a traced scalar (the tracker's threshold is
    focal-scaled and focal is traced). Returns (pose, inlier_mask).
    """
    dtype = X.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    # minimal sample of 3 for P3P (the reference's cv::solvePnPRansac(P3P)
    # samples 4 and disambiguates with the 4th; scoring every candidate
    # against all N points subsumes that and is one batched pass here)
    idx = ransac_mod.sample_minimal_sets(key, mask, num_hypotheses, 3)
    Xs = X[idx]                                              # (H, 3, 3)
    rs = r[idx]
    bear = rs / jnp.maximum(
        jnp.linalg.norm(rs, axis=-1, keepdims=True), tiny
    )
    cand, cand_valid = p3p_mod.p3p_solve(Xs, bear)           # (H, 12) SE3
    H = num_hypotheses
    C = cand_valid.shape[-1]
    poses = SE3(cand.R.reshape(H * C, 3, 3), cand.t.reshape(H * C, 3))
    flat_valid = cand_valid.reshape(H * C)
    errors = reprojection_error_sq(
        SE3(poses.R[:, None], poses.t[:, None]), X[None], r[None]
    )                                                         # (HC, N)
    errors = jnp.where(
        flat_valid[:, None], errors, jnp.asarray(jnp.inf, dtype)
    )
    best, inl, _ = ransac_mod._select_best(errors, mask, thr_sq)
    pose = SE3(poses.R[best], poses.t[best])
    best_inl = inl[best]

    if refit:
        # linear 6+-point DLT refit over the consensus set; degenerate
        # (planar) consensus sets yield a garbage pose that simply loses the
        # inlier-count comparison below, so the refit is safe to attempt
        # unconditionally (NaN errors compare False -> zero inliers).
        wf = best_inl.astype(dtype)
        R_raw, t_raw = _pose_dlt(X, r, wf)
        pose_fit = _pose_from_dlt(R_raw, t_raw, X, wf)
        fin = jnp.all(jnp.isfinite(pose_fit.R)) & jnp.all(
            jnp.isfinite(pose_fit.t))
        pose_fit = SE3(
            jnp.where(fin, pose_fit.R, pose.R),
            jnp.where(fin, pose_fit.t, pose.t),
        )
        err_fit = reprojection_error_sq(pose_fit, X, r)
        inl_fit = jnp.logical_and(err_fit < thr_sq, mask)
        better = jnp.logical_and(fin, jnp.sum(inl_fit) > jnp.sum(best_inl))
        pose = SE3(
            jnp.where(better, pose_fit.R, pose.R),
            jnp.where(better, pose_fit.t, pose.t),
        )
        best_inl = jnp.where(better, inl_fit, best_inl)

    # geometric polish on the inlier set (the DLT cost is only algebraic)
    pose = refine_pose_gn(pose, X, r, best_inl.astype(dtype))
    err = reprojection_error_sq(pose, X, r)
    best_inl = jnp.logical_and(err < thr_sq, mask)
    return pose, best_inl


def pnp_solve(
    X: Array,
    r: Array,
    mask: Array,
    key: Array,
    params: PnpParams = PnpParams(),
) -> PnpResult:
    """Camera pose from 3D-2D matches by batched P3P-RANSAC.

    X: (N, 3) world points; r: (N, 3) homogeneous ideal-plane observations;
    mask: (N,) valid correspondences. Reference ``pnp_solve``
    (``vision/pnp-solve.cpp:16-104``): P3P-RANSAC, 100 iters, reprojection
    threshold 0.05, >= 7 points.
    """
    pose, best_inl = pnp_ransac_core(
        X, r, mask, key, params.num_hypotheses,
        params.threshold * params.threshold, params.refit,
    )
    num = jnp.sum(best_inl).astype(jnp.int32)
    return PnpResult(
        pose=pose,
        inlier_mask=best_inl,
        num_inliers=num,
        success=num >= params.min_inliers,
    )


def pnp_refine(
    pose0: SE3,
    pose0_info: Array,
    X: Array,
    X_info: Array,
    r: Array,
    obs_weight: Array,
    mask: Array,
    ba_params: ba_mod.BAParams = ba_mod.BAParams(),
) -> tuple[SE3, Array, Array]:
    """Motion-(mostly-)only BA: one frame + N points with point priors.

    Reference ``pnp_refine`` (``vision/pnp-refine.cpp:16-108``): the pose is
    regulated by its own prior (sigma=1e-2 there -> ``pose0_info``), points
    carry priors from their estimates (``X_info`` = inverse covariances);
    points are optimized but not written back. Returns
    (refined pose, pose covariance (6, 6), final error).
    """
    prob = ba_mod.BAProblem.create(
        poses0=SE3(pose0.R[None], pose0.t[None]),
        points0=X,
        obs=r[None, :, :2],
        obs_mask=mask[None],
        obs_weight=obs_weight[None],
        pose_prior=SE3(pose0.R[None], pose0.t[None]),
        pose_prior_info=pose0_info[None],
        point_prior=X,
        point_prior_info=X_info,
    )
    result = ba_mod.ba_solve(prob, ba_params)
    pose = SE3(result.poses.R[0], result.poses.t[0])
    return pose, result.pose_covariance[0], result.error
