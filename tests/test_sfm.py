"""Two-view SfM oracle tests.

Mirrors reference ``test/test-sfm.cpp``: project the cube / L-shape rigs
through two ideal cameras with a known unit-x-translation relative pose and
assert ``sfm_solve`` recovers pose and points to the reference tolerance
(1e-3 per component, ``test-sfm.cpp:19``), ``sfm_triangulate`` likewise
(``:92-155``). Adds RANSAC outlier-rejection cases the reference lacks
(its shuffle is disabled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.math.lie import SE3, so3_from_rpy
from mvslam_tpu.ops import epipolar, ransac, sfm, triangulate

from conftest import tol_for
from helpers import CUBE, L_SHAPE, get_rig_points, se3_from_parts


def project_ideal(pose_cam_in_world: SE3, points_world):
    """Rays in an ideal camera whose pose (camera-to-world) is given."""
    p_cam = pose_cam_in_world.inverse().apply(points_world)
    return p_cam / p_cam[..., 2:3]


def two_view_fixture(rig, dtype, n_pad=0, pose2in1=None):
    """Rig in front of camera 1 (at origin, +z forward), camera 2 at +x."""
    points = get_rig_points(
        rig, rotation=np.asarray(so3_from_rpy(0.1, -0.2, 0.3, dtype=jnp.float64)),
        translation=(0.3, -0.2, 6.0), scale=1.0, dtype=dtype,
    )
    pose1 = SE3.identity(dtype=dtype)
    if pose2in1 is None:
        pose2in1 = se3_from_parts(np.eye(3), [1.0, 0.0, 0.0], dtype=dtype)
    r1 = project_ideal(pose1, points)
    r2 = project_ideal(pose2in1, points)
    mask = jnp.ones(points.shape[0], dtype=bool)
    if n_pad:
        pad = jnp.zeros((n_pad, 3), dtype=dtype)
        r1 = jnp.concatenate([r1, pad])
        r2 = jnp.concatenate([r2, pad])
        mask = jnp.concatenate([mask, jnp.zeros(n_pad, dtype=bool)])
        points = jnp.concatenate([points, jnp.zeros((n_pad, 3), dtype=dtype)])
    return points, pose2in1, r1, r2, mask


@pytest.mark.parametrize("rig", [CUBE, L_SHAPE])
def test_essential_matrix_epipolar_constraint(rig, dtype):
    _, _, r1, r2, mask = two_view_fixture(rig, dtype)
    E = epipolar.find_essential_matrix(r1, r2, mask.astype(dtype))
    res = epipolar.epipolar_residual(E, r1, r2)
    assert float(jnp.max(res)) < tol_for(dtype)


def test_fundamental_matrix_pixel_points(dtype):
    points, pose2in1, r1, r2, mask = two_view_fixture(CUBE, dtype)
    # synthesize pixel coords with a non-trivial K
    K = jnp.asarray([[350.0, 0.0, 192.0], [0.0, 350.0, 144.0], [0, 0, 1.0]], dtype)
    p1 = (r1 @ K.T)[:, :2]
    p2 = (r2 @ K.T)[:, :2]
    F = epipolar.find_fundamental_matrix(p1, p2, mask.astype(dtype))
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    res = jnp.abs(jnp.sum(h2 * (h1 @ F.T), axis=-1))
    # pixel-scale algebraic residual; normalize by F scale already |F|=1
    assert float(jnp.max(res)) < 100 * tol_for(dtype)
    # rank deficiency
    s = jnp.linalg.svd(F, compute_uv=False)
    assert float(s[2]) < 100 * tol_for(dtype)


@pytest.mark.parametrize("rig", [CUBE, L_SHAPE])
def test_sfm_solve_recovers_pose_and_points(rig, dtype):
    points, pose2in1, r1, r2, mask = two_view_fixture(rig, dtype, n_pad=8)
    key = jax.random.PRNGKey(0)
    result = sfm.sfm_solve(r1, r2, mask, key)
    tol = tol_for(dtype)
    assert bool(result.success)
    # reference tolerance: each se3 component within 1e-3 (test-sfm.cpp:79-87)
    err = jnp.max(jnp.abs(result.pose2in1.log() - pose2in1.log()))
    assert float(err) < tol
    # points (scale is unit because |t_gt| = 1)
    pm = np.asarray(result.point_mask)
    assert pm[: points.shape[0] - 8].all()
    perr = jnp.abs(result.points - points)[result.point_mask]
    assert float(jnp.max(perr)) < 10 * tol


def test_sfm_solve_rejects_outliers(dtype):
    rng = np.random.default_rng(7)
    n_in, n_out = 48, 16
    pts = jnp.asarray(
        np.c_[rng.uniform(-2, 2, (n_in, 2)), rng.uniform(4, 9, n_in)], dtype
    )
    pose2in1 = se3_from_parts(
        np.asarray(so3_from_rpy(0.02, -0.01, 0.03, dtype=jnp.float64)),
        [0.8, -0.36, 0.48], dtype=dtype,
    )
    r1 = project_ideal(SE3.identity(dtype=dtype), pts)
    r2 = project_ideal(pose2in1, pts)
    # corrupt the last n_out correspondences
    bad = jnp.asarray(rng.uniform(-0.5, 0.5, (n_out, 2)), dtype)
    r2 = r2.at[n_in - n_out :, :2].add(bad)
    mask = jnp.ones(n_in, dtype=bool)
    result = sfm.sfm_solve(
        r1, r2, mask, jax.random.PRNGKey(3),
        sfm.SfmParams(num_hypotheses=512, threshold_sq=1e-4),
    )
    inl = np.asarray(result.inlier_mask)
    assert inl[: n_in - n_out].all()
    assert not inl[n_in - n_out :].any()
    t_gt = pose2in1.t / jnp.linalg.norm(pose2in1.t)
    err = jnp.max(jnp.abs(result.pose2in1.log() - SE3(pose2in1.R, t_gt).log()))
    assert float(err) < 10 * tol_for(dtype)


@pytest.mark.parametrize("rig", [CUBE, L_SHAPE])
def test_sfm_triangulate_known_pose(rig, dtype):
    points, pose2in1, r1, r2, mask = two_view_fixture(rig, dtype)
    X, pm = sfm.sfm_triangulate(r1, r2, mask, pose2in1)
    assert np.asarray(pm).all()
    assert float(jnp.max(jnp.abs(X - points))) < 10 * tol_for(dtype)


def test_triangulate_rejects_behind_camera(dtype):
    # a point behind both cameras must fail cheirality
    P1 = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], -1)
    pose2 = se3_from_parts(np.eye(3), [1.0, 0.0, 0.0], dtype=dtype)
    P2 = pose2.inverse().matrix3x4()
    X = jnp.asarray([[0.0, 0.0, -5.0]], dtype)
    assert not bool(triangulate.cheirality_mask(P1, P2, X)[0])


def test_sample_minimal_sets_distinct_and_valid():
    key = jax.random.PRNGKey(1)
    mask = jnp.arange(64) < 20
    idx = ransac.sample_minimal_sets(key, mask, 128, 8)
    idx_np = np.asarray(idx)
    assert (idx_np < 20).all()
    for row in idx_np:
        assert len(set(row.tolist())) == 8


def test_sfm_solve_jits_and_caches(dtype):
    points, pose2in1, r1, r2, mask = two_view_fixture(CUBE, dtype, n_pad=8)
    solve = jax.jit(lambda a, b, m, k: sfm.sfm_solve(a, b, m, k))
    r = solve(r1, r2, mask, jax.random.PRNGKey(0))
    assert bool(r.success)
    # second call hits the cache with same shapes
    r2_ = solve(r1, r2, mask, jax.random.PRNGKey(42))
    assert bool(r2_.success)


def test_fundamental_ransac_pixel_space(dtype, rng):
    # reference FundamentalMatrixEstimatorRANSAC (estimator-RANSAC.cpp:16-90):
    # pixel-space 8-point RANSAC, inlier test |p2^T F p1| < max_error
    n_in, n_out = 40, 12
    pts = jnp.asarray(
        np.c_[rng.uniform(-2, 2, (n_in + n_out, 2)),
              rng.uniform(4, 9, n_in + n_out)], dtype
    )
    pose2in1 = se3_from_parts(
        np.asarray(so3_from_rpy(0.05, -0.03, 0.02, dtype=jnp.float64)),
        [1.0, 0.1, -0.05], dtype=dtype,
    )
    r1 = pts / pts[:, 2:3]
    p_cam2 = pose2in1.inverse().apply(pts)
    r2 = p_cam2 / p_cam2[:, 2:3]
    K = jnp.asarray([[350.0, 0, 192.0], [0, 350.0, 144.0], [0, 0, 1.0]], dtype)
    p1 = (r1 @ K.T)[:, :2]
    p2 = (r2 @ K.T)[:, :2]
    # corrupt the tail with gross pixel outliers
    p2 = p2.at[n_in:].add(jnp.asarray(rng.uniform(30, 80, (n_out, 2)), dtype))
    mask = jnp.ones(n_in + n_out, dtype=bool)
    res = ransac.fundamental_ransac(
        p1, p2, mask, jax.random.PRNGKey(3), max_error=1e-3
    )
    inl = np.asarray(res.inlier_mask)
    assert inl[:n_in].all()
    assert not inl[n_in:].any()
    # rank-2 and epipolar-consistent on the inliers
    s = jnp.linalg.svd(res.model, compute_uv=False)
    assert float(s[2]) < 1e-4
