"""Bundle adjustment + PnP oracle tests.

Mirrors reference ``test/test-sfm.cpp:157-288`` (two-view refine under noise
sigma=5e-3 recovers to 2.5e-2 from perturbed initial guesses) and
``test/test-pnp.cpp`` (exact pose recovery to 1e-3; noisy refine to 2.5e-2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.math.lie import SE3, so3_from_rpy
from mvslam_tpu.ops import ba, pnp, sfm

from conftest import tol_for
from helpers import CUBE, L_SHAPE, get_rig_points, random_se3, se3_from_parts

NOISE_STD = 5e-3          # reference test-sfm.cpp:159
NOISY_TOL = 2.5e-2        # reference test-sfm.cpp:276-285


def project_ideal(pose_cam_in_world: SE3, points_world):
    p_cam = pose_cam_in_world.inverse().apply(points_world)
    return p_cam / p_cam[..., 2:3]


def two_view_setup(rig, dtype):
    points = get_rig_points(
        rig,
        rotation=np.asarray(so3_from_rpy(0.1, -0.2, 0.3, dtype=jnp.float64)),
        translation=(0.3, -0.2, 6.0),
        dtype=dtype,
    )
    pose2in1 = se3_from_parts(
        np.asarray(so3_from_rpy(0.05, -0.03, 0.02, dtype=jnp.float64)),
        [1.0, 0.1, -0.05],
        dtype=dtype,
    )
    r1 = project_ideal(SE3.identity(dtype=dtype), points)
    r2 = project_ideal(pose2in1, points)
    mask = jnp.ones(points.shape[0], dtype=bool)
    return points, pose2in1, r1, r2, mask


@pytest.mark.parametrize("rig", [CUBE, L_SHAPE])
def test_sfm_refine_noiseless_stays_exact(rig, dtype):
    points, pose2in1, r1, r2, mask = two_view_setup(rig, dtype)
    res = sfm.sfm_refine(r1, r2, mask, pose2in1, points, obs_stddev=NOISE_STD)
    tol = tol_for(dtype)
    assert float(jnp.max(jnp.abs(res.pose2in1.log() - pose2in1.log()))) < tol
    assert float(jnp.max(jnp.abs(res.points - points))) < 10 * tol
    assert bool(res.converged)


@pytest.mark.parametrize("rig", [CUBE, L_SHAPE])
def test_sfm_refine_recovers_under_noise(rig, dtype):
    # fixed draw: the 2.5e-2 bound is tight at this noise level (the scale
    # gauge is pinned only by weak regulator priors — as in the reference,
    # whose own test also runs one fixed draw)
    rng = np.random.default_rng(0)
    points, pose2in1, r1, r2, mask = two_view_setup(rig, dtype)
    # noisy measurements (reference: sigma = 5e-3 on ideal coordinates)
    r1n = r1.at[:, :2].add(
        jnp.asarray(rng.normal(0, NOISE_STD, (8, 2)), dtype)
    )
    r2n = r2.at[:, :2].add(
        jnp.asarray(rng.normal(0, NOISE_STD, (8, 2)), dtype)
    )
    # perturbed initial guesses
    pose_init = pose2in1.compose(random_se3(rng, 0.02, dtype=dtype))
    points_init = points + jnp.asarray(rng.normal(0, 0.02, (8, 3)), dtype)
    res = sfm.sfm_refine(
        r1n, r2n, mask, pose_init, points_init, obs_stddev=NOISE_STD
    )
    assert float(jnp.max(jnp.abs(res.pose2in1.log() - pose2in1.log()))) < NOISY_TOL
    assert float(jnp.max(jnp.abs(res.points - points))) < 2 * NOISY_TOL
    # covariances: symmetric positive definite
    pc = np.asarray(res.pose_covariance, dtype=np.float64)
    assert np.allclose(pc, pc.T, atol=1e-8)
    assert (np.linalg.eigvalsh(pc) > 0).all()
    xc = np.asarray(res.point_covariance, dtype=np.float64)
    assert (np.linalg.eigvalsh(xc) > -1e-12).all()


def test_ba_cost_decreases_and_masks_ignored(dtype, rng):
    points, pose2in1, r1, r2, mask = two_view_setup(CUBE, dtype)
    # poison the masked-out observation rows with garbage — result must not move
    r1g = jnp.concatenate([r1, jnp.full((4, 3), 1e3, dtype)])
    r2g = jnp.concatenate([r2, jnp.full((4, 3), -1e3, dtype)])
    maskg = jnp.concatenate([mask, jnp.zeros(4, dtype=bool)])
    pts_g = jnp.concatenate([points, jnp.zeros((4, 3), dtype)])
    res = sfm.sfm_refine(r1g, r2g, maskg, pose2in1, pts_g, obs_stddev=NOISE_STD)
    assert float(jnp.max(jnp.abs(res.pose2in1.log() - pose2in1.log()))) < tol_for(dtype)


def test_ba_huber_caps_gross_outlier(dtype, rng):
    """An unmasked gross outlier biases the plain Gaussian BA; with
    ``huber_delta`` the IRLS reweighting caps its influence and the
    refined pose stays near truth (no reference counterpart — gtsam is
    run kernel-free there, vision/ba.cpp:96-117; this guards OUR robust
    option)."""
    points, pose2in1, r1, r2, mask = two_view_setup(CUBE, dtype)
    # corrupt ONE visible observation by 40 sigma in the second view
    r2_bad = r2.at[2, 0].add(40.0 * NOISE_STD)
    kw = dict(obs_stddev=NOISE_STD)
    res_plain = sfm.sfm_refine(r1, r2_bad, mask, pose2in1, points, **kw)
    res_huber = sfm.sfm_refine(
        r1, r2_bad, mask, pose2in1, points,
        ba_params=ba.BAParams(huber_delta=2.0), **kw)
    err_plain = float(jnp.max(jnp.abs(res_plain.pose2in1.log()
                                      - pose2in1.log())))
    err_huber = float(jnp.max(jnp.abs(res_huber.pose2in1.log()
                                      - pose2in1.log())))
    assert err_huber < err_plain, (err_huber, err_plain)
    assert err_huber < NOISY_TOL, err_huber


@pytest.mark.parametrize("rig", [CUBE, L_SHAPE])
def test_pnp_solve_exact(rig, dtype):
    # reference test-pnp.cpp:14-60: noiseless recovery to 1e-3
    points = get_rig_points(
        rig,
        rotation=np.asarray(so3_from_rpy(0.1, -0.2, 0.3, dtype=jnp.float64)),
        translation=(0.3, -0.2, 6.0),
        dtype=dtype,
    )
    pose = se3_from_parts(
        np.asarray(so3_from_rpy(-0.04, 0.06, 0.1, dtype=jnp.float64)),
        [0.4, -0.2, 0.3],
        dtype=dtype,
    )
    r = project_ideal(pose, points)
    mask = jnp.ones(points.shape[0], dtype=bool)
    res = pnp.pnp_solve(points, r, mask, jax.random.PRNGKey(0))
    assert bool(res.success)
    assert int(res.num_inliers) == points.shape[0]
    assert float(jnp.max(jnp.abs(res.pose.log() - pose.log()))) < tol_for(dtype)


def test_pnp_solve_with_outliers(dtype, rng):
    n_in, n_out = 40, 14
    pts = jnp.asarray(
        np.c_[rng.uniform(-2, 2, (n_in + n_out, 2)),
              rng.uniform(4, 9, n_in + n_out)], dtype
    )
    pose = se3_from_parts(
        np.asarray(so3_from_rpy(0.1, 0.05, -0.07, dtype=jnp.float64)),
        [0.5, -0.3, 0.2], dtype=dtype,
    )
    r = project_ideal(pose, pts)
    r = r.at[n_in:, :2].add(jnp.asarray(rng.uniform(0.2, 0.6, (n_out, 2)), dtype))
    mask = jnp.ones(n_in + n_out, dtype=bool)
    res = pnp.pnp_solve(
        pts, r, mask, jax.random.PRNGKey(5),
        pnp.PnpParams(num_hypotheses=512, threshold=0.01),
    )
    inl = np.asarray(res.inlier_mask)
    assert inl[:n_in].all()
    assert not inl[n_in:].any()
    assert float(jnp.max(jnp.abs(res.pose.log() - pose.log()))) < 10 * tol_for(dtype)


def test_pnp_solve_planar_scene(dtype, rng):
    # all world points on one plane (z = 5): a linear DLT minimal solver is
    # degenerate here; the P3P path must still recover the pose exactly.
    # This is the robustness the reference gets from cv::solvePnPRansac(P3P)
    # (vision/pnp-solve.cpp:43-49).
    n = 24
    xy = rng.uniform(-2.0, 2.0, (n, 2))
    pts = jnp.asarray(np.c_[xy, np.full(n, 5.0)], dtype)
    pose = se3_from_parts(
        np.asarray(so3_from_rpy(0.12, -0.08, 0.2, dtype=jnp.float64)),
        [0.3, -0.1, 0.4],
        dtype=dtype,
    )
    r = project_ideal(pose, pts)
    mask = jnp.ones(n, dtype=bool)
    res = pnp.pnp_solve(pts, r, mask, jax.random.PRNGKey(2))
    assert bool(res.success)
    assert int(res.num_inliers) == n
    assert float(jnp.max(jnp.abs(res.pose.log() - pose.log()))) < tol_for(dtype)


def test_p3p_candidates_contain_truth(dtype):
    # direct minimal-solver oracle: the true pose must be among the <=4
    # Grunert candidates for a noiseless non-degenerate triple.
    from mvslam_tpu.ops import p3p as p3p_mod

    pts = get_rig_points(
        L_SHAPE,
        rotation=np.asarray(so3_from_rpy(0.1, -0.2, 0.3, dtype=jnp.float64)),
        translation=(0.3, -0.2, 6.0),
        dtype=dtype,
    )[:3]
    pose = se3_from_parts(
        np.asarray(so3_from_rpy(-0.04, 0.06, 0.1, dtype=jnp.float64)),
        [0.4, -0.2, 0.3],
        dtype=dtype,
    )
    r = project_ideal(pose, pts)
    bear = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    cand, valid = p3p_mod.p3p_solve(pts[None], bear[None])
    d = jnp.max(jnp.abs(cand.log() - pose.log()[None, None]), axis=-1)
    d = jnp.where(valid, d, jnp.inf)
    assert bool(valid.any())
    assert float(jnp.min(d)) < tol_for(dtype)


def test_pnp_refine_under_noise(dtype, rng):
    # reference test-pnp.cpp:62-159: noisy refine to 2.5e-2
    points = get_rig_points(
        CUBE,
        rotation=np.asarray(so3_from_rpy(0.1, -0.2, 0.3, dtype=jnp.float64)),
        translation=(0.3, -0.2, 6.0),
        dtype=dtype,
    )
    pose = se3_from_parts(
        np.asarray(so3_from_rpy(-0.04, 0.06, 0.1, dtype=jnp.float64)),
        [0.4, -0.2, 0.3], dtype=dtype,
    )
    r = project_ideal(pose, points)
    r = r.at[:, :2].add(jnp.asarray(rng.normal(0, NOISE_STD, (8, 2)), dtype))
    mask = jnp.ones(8, dtype=bool)
    pose_init = pose.compose(random_se3(rng, 0.02, dtype=dtype))
    reg_info = 1e4 * jnp.eye(6, dtype=dtype)
    point_info = jnp.broadcast_to(
        (1.0 / NOISE_STD**2) * jnp.eye(3, dtype=dtype), (8, 3, 3)
    )
    refined, cov, err = pnp.pnp_refine(
        pose_init, reg_info, points, point_info, r,
        obs_weight=jnp.full((8,), 1.0 / NOISE_STD, dtype), mask=mask,
    )
    assert float(jnp.max(jnp.abs(refined.log() - pose.log()))) < NOISY_TOL
    c = np.asarray(cov, dtype=np.float64)
    assert (np.linalg.eigvalsh(c) > 0).all()


def test_ba_solve_jits(dtype):
    points, pose2in1, r1, r2, mask = two_view_setup(CUBE, dtype)
    fn = jax.jit(
        lambda a, b, m, p, x: sfm.sfm_refine(a, b, m, p, x, obs_stddev=NOISE_STD)
    )
    res = fn(r1, r2, mask, pose2in1, points)
    assert bool(res.converged)
