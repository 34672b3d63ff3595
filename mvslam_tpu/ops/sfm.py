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
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import epipolar, ransac, triangulate

Array = jax.Array

#: reference constants (vision/sfm-solve.cpp:18-23)
MAX_ERROR_SQ = 5e-2
VF_MATCH_INLIER_MIN = 8

#: reference two-view refine priors (vision/sfm-refine.cpp:11-18)
ANCHOR_STDDEV = 1e-5      # frame-0 anchor prior
REGULATOR_STDDEV = 1e-2   # frame-1 + point regulator priors


class SfmParams(NamedTuple):
    """Static solve configuration (shapes/budgets must be Python ints)."""

    num_hypotheses: int = 256
    threshold_sq: float = MAX_ERROR_SQ   # squared ideal-plane units
    min_inliers: int = VF_MATCH_INLIER_MIN
    min_depth: float = 0.0               # cheirality lower bound
    refit: bool = True
    polish: bool = True                  # Sampson GN on the recovered pose
    polish_iterations: int = 6


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
    E = rr.model
    if params.polish:
        # geometric (Sampson) polish of the 5-dof relative pose on the
        # inlier set, then re-triangulate against the polished pose
        pose2in1 = epipolar.refine_relative_pose_sampson(
            pose2in1, r1, r2, rr.inlier_mask.astype(r1.dtype),
            iterations=params.polish_iterations,
        )
        E = epipolar.essential_from_pose(pose2in1)
        points, point_mask = sfm_triangulate(
            r1, r2, rr.inlier_mask, pose2in1, params.min_depth
        )
    success = rr.num_inliers >= params.min_inliers
    return SfmResult(
        pose2in1=pose2in1,
        points=points,
        point_mask=point_mask,
        inlier_mask=rr.inlier_mask,
        num_inliers=rr.num_inliers,
        num_points=jnp.sum(point_mask).astype(jnp.int32),
        E=E,
        success=success,
    )


class SfmRefineResult(NamedTuple):
    pose2in1: SE3
    pose_covariance: Array     # (6, 6)
    points: Array              # (N, 3)
    point_covariance: Array    # (N, 3, 3)
    point_mask: Array          # (N,)
    error: Array
    iterations: Array
    converged: Array
    point_information: Array | None = None  # (N, 3, 3) when requested


def sfm_refine(
    r1: Array,
    r2: Array,
    mask: Array,
    pose2in1: SE3,
    points: Array,
    obs_stddev: Array | float = 1.0,
    ba_params: ba_mod.BAParams = ba_mod.BAParams(),
    anchor_stddev: float = ANCHOR_STDDEV,
    regulator_stddev: float = REGULATOR_STDDEV,
    gauge: str = "regulator",
) -> SfmRefineResult:
    """Two-view bundle adjustment (reference ``sfm_refine``,
    ``vision/sfm-refine.cpp:20-139``).

    Frame 0 sits at the origin under a tight anchor prior (sigma=1e-5).
    The remaining monocular gauge freedom (global scale) is fixed per
    ``gauge``:

    - ``"regulator"`` (reference parity, ``sfm-refine.cpp:11-18``): weak
      sigma=1e-2 priors on the full frame-1 pose and on every point. Note
      this also pulls the solution toward the *initial* estimates — fine
      when the initializer is already accurate (the reference's assumption),
      biased when it is not.
    - ``"scale_only"``: a single tight prior on the component of the frame-1
      translation along its initial direction — pins exactly the
      unobservable scale dof and nothing else. Preferred by the VO pipeline.

    ``obs_stddev``: per-match measurement noise — scalar, (N,) shared by
    both frames, or (2, N) per-frame (the reference derives per-keypoint
    noise from the octave, ``visual-feature.cpp:192-207``; per-frame
    sigmas let template-anchored observations — exact by construction —
    carry their true near-zero noise while tracked observations carry the
    tracker's).
    Returns refined pose/point estimates with marginal covariances and the
    final optimization error, mirroring the reference's outputs.
    """
    dtype = points.dtype
    n = points.shape[0]
    sig_in = jnp.asarray(obs_stddev, dtype)
    if sig_in.ndim == 2:
        obs_weight = 1.0 / sig_in                                # (2, N)
    else:
        sig = jnp.broadcast_to(sig_in, (n,))
        obs_weight = jnp.stack([1.0 / sig, 1.0 / sig])           # (2, N)
    poses0 = SE3(
        jnp.stack([jnp.eye(3, dtype=dtype), pose2in1.R]),
        jnp.stack([jnp.zeros(3, dtype=dtype), pose2in1.t]),
    )
    anchor_info = 1.0 / (anchor_stddev * anchor_stddev)
    reg_info = 1.0 / (regulator_stddev * regulator_stddev)
    if gauge == "regulator":
        frame1_info = reg_info * jnp.eye(6, dtype=dtype)
        point_prior_info = jnp.broadcast_to(
            reg_info * jnp.eye(3, dtype=dtype), (n, 3, 3)
        )
    elif gauge == "scale_only":
        # tangent delta on T1 moves t1 by R1 @ delta_u (right perturbation);
        # global rescaling moves t1 along its own direction, i.e.
        # delta_u along R1^T t_hat — penalize exactly that direction
        t_norm = jnp.linalg.norm(pose2in1.t)
        t_hat = pose2in1.t / jnp.maximum(t_norm, jnp.finfo(dtype).tiny)
        u_dir = pose2in1.R.T @ t_hat
        frame1_info = jnp.zeros((6, 6), dtype)
        frame1_info = frame1_info.at[:3, :3].set(
            anchor_info * jnp.outer(u_dir, u_dir)
        )
        point_prior_info = jnp.zeros((n, 3, 3), dtype)
    else:
        raise ValueError(f"unknown gauge {gauge!r}")
    pose_prior_info = jnp.stack(
        [anchor_info * jnp.eye(6, dtype=dtype), frame1_info]
    )
    prob = ba_mod.BAProblem.create(
        poses0=poses0,
        points0=points,
        obs=jnp.stack([r1[:, :2], r2[:, :2]]),
        obs_mask=jnp.stack([mask, mask]),
        obs_weight=obs_weight,
        pose_prior=poses0,
        pose_prior_info=pose_prior_info,
        point_prior=points,
        point_prior_info=point_prior_info,
    )
    result = ba_mod.ba_solve(prob, ba_params)
    return SfmRefineResult(
        pose2in1=SE3(result.poses.R[1], result.poses.t[1]),
        pose_covariance=result.pose_covariance[1],
        points=result.points,
        point_covariance=result.point_covariance,
        point_mask=mask,
        error=result.error,
        iterations=result.iterations,
        converged=result.converged,
        point_information=result.point_information,
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
