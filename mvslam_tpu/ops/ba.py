"""Levenberg-Marquardt bundle adjustment with landmark Schur complement.

This is the single optimization kernel everything funnels into — the rebuild
of the reference's gtsam delegation (``vision/ba.cpp:26-156``:
``NonlinearFactorGraph`` of priors + ``GenericProjectionFactor``s, solved by
LM, covariances from ``Marginals``). Here the factor graph is implicit in
dense, statically-shaped arrays:

- poses: (F,) camera-to-world SE3 (world point X projects via ``T^-1 X``),
- points: (P, 3) world landmarks,
- observations: (F, P, 2) ideal-plane measurements + mask + per-obs weight
  (1/sigma, the reference's isotropic keypoint noise,
  ``visual-feature.cpp:192-207``),
- Gaussian priors on any subset of poses/points (information-matrix form) —
  the reference's anchor (sigma=1e-5) and regulator (sigma=1e-2) priors
  (``sfm-refine.cpp:11-18``) are just rows of these arrays.

Every LM iteration builds the block-sparse normal equations analytically
(2x6 / 2x3 Jacobian blocks, einsum-batched over all F*P observations at
once), eliminates the landmark block with the Schur complement (3x3
closed-form inverses, batched), solves the reduced 6F x 6F camera system by
Cholesky, and applies a gain-ratio-gated damping update — a fixed-shape
``lax.while_loop`` with no data-dependent Python control flow.

Marginal covariances (the reference returns them from gtsam ``Marginals``)
come from the same factorization at the solution: ``Sigma_cc = S^{-1}`` and
``Sigma_pp,i = Hpp_i^{-1} + Hpp_i^{-1} W_i^T Sigma_cc W_i Hpp_i^{-1}``.

Pose tangent convention: right perturbation ``T <- T . exp(delta)`` with the
translation-first layout of ``mvslam_tpu.math.lie``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import SE3, skew

Array = jax.Array


class BAProblem(NamedTuple):
    """Statically-shaped BA problem. F frames, P points.

    ``obs``: (F, P, 2) ideal-plane measurements; invalid entries arbitrary.
    ``obs_mask``: (F, P) validity. ``obs_weight``: (F, P) 1/sigma per obs.
    Priors are information-form Gaussians with a validity mask; zero-info
    rows are equivalent to masked-out rows.
    """

    poses0: SE3                 # (F,) initial camera-to-world poses
    points0: Array              # (P, 3) initial landmarks
    obs: Array                  # (F, P, 2)
    obs_mask: Array             # (F, P) bool
    obs_weight: Array           # (F, P)
    pose_prior: SE3             # (F,) prior means
    pose_prior_info: Array      # (F, 6, 6)
    point_prior: Array          # (P, 3)
    point_prior_info: Array     # (P, 3, 3)

    @staticmethod
    def create(
        poses0: SE3,
        points0: Array,
        obs: Array,
        obs_mask: Array,
        obs_weight: Array | None = None,
        pose_prior: SE3 | None = None,
        pose_prior_info: Array | None = None,
        point_prior: Array | None = None,
        point_prior_info: Array | None = None,
    ) -> "BAProblem":
        dtype = points0.dtype
        F = poses0.t.shape[0]
        P = points0.shape[0]
        if obs_weight is None:
            obs_weight = jnp.ones((F, P), dtype)
        if pose_prior is None:
            pose_prior = SE3.identity((F,), dtype=dtype)
        if pose_prior_info is None:
            pose_prior_info = jnp.zeros((F, 6, 6), dtype)
        if point_prior is None:
            point_prior = jnp.zeros((P, 3), dtype)
        if point_prior_info is None:
            point_prior_info = jnp.zeros((P, 3, 3), dtype)
        return BAProblem(
            poses0, points0, obs, jnp.asarray(obs_mask, bool), obs_weight,
            pose_prior, pose_prior_info, point_prior, point_prior_info,
        )


class BAParams(NamedTuple):
    max_iterations: int = 50
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    lambda_min: float = 1e-12
    lambda_max: float = 1e8
    # relative cost-decrease convergence threshold (gtsam LM default spirit)
    rel_decrease: float = 1e-8
    abs_decrease: float = 0.0
    # marginal covariances (reference ba.cpp:127-155 Marginals) cost a full
    # extra normal-equations build + PSD inverses; callers that discard them
    # (the fused VO step) turn this off
    compute_covariance: bool = True
    # per-point 3x3 information blocks Hpp at the solution (data + prior):
    # the recursive landmark-information filter the VO map carries so later
    # frames can re-resolve along-ray (depth) error instead of locking it
    # in with an isotropic prior
    compute_point_info: bool = False
    # Huber M-estimator threshold on the WHITENED residual norm (sigmas).
    # None = pure Gaussian (gtsam-default parity; the reference builds its
    # projection factors without a robust kernel, vision/ba.cpp:96-117).
    # Set (e.g. 3.0) to cap gross-outlier influence via IRLS reweighting
    # inside each LM iteration, with the matching Huber rho in the cost.
    huber_delta: float | None = None


class BAResult(NamedTuple):
    poses: SE3                  # (F,)
    points: Array               # (P, 3)
    pose_covariance: Array      # (F, 6, 6)
    point_covariance: Array     # (P, 3, 3)
    error: Array                # final 0.5 * sum of squared weighted residuals
    iterations: Array           # LM iterations executed
    converged: Array            # bool
    point_information: Array | None = None  # (P, 3, 3) Hpp at the solution


def _projection_residuals(poses: SE3, points: Array, prob: BAProblem,
                          huber_delta: float | None = None):
    """Weighted residuals + Jacobian blocks for all (F, P) observations.

    Returns r (F, P, 2), Jc (F, P, 2, 6), Jp (F, P, 2, 3) — all pre-masked
    and pre-weighted. With ``huber_delta``, residual rows are additionally
    IRLS-scaled by ``sqrt(w_huber)`` (Triggs-style robust reweighting).
    """
    R = poses.R                                   # (F, 3, 3)
    t = poses.t                                   # (F, 3)
    # camera-frame points: X_c = R^T (X - t)  -> (F, P, 3)
    diff = points[None, :, :] - t[:, None, :]
    Xc = jnp.einsum("fji,fpj->fpi", R, diff)
    z = Xc[..., 2]
    # guard small/negative depth; such obs should be masked by the caller,
    # but keep the math finite either way
    eps = jnp.asarray(jnp.finfo(points.dtype).eps, points.dtype)
    safe_z = jnp.where(jnp.abs(z) < 1e3 * eps, 1e3 * eps, z)
    proj = Xc[..., :2] / safe_z[..., None]
    w = jnp.where(prob.obs_mask, prob.obs_weight, 0.0)
    r = (proj - prob.obs) * w[..., None]

    # d proj / d X_c : (F, P, 2, 3)
    inv_z = 1.0 / safe_z
    zero = jnp.zeros_like(inv_z)
    dproj = jnp.stack(
        [
            jnp.stack([inv_z, zero, -Xc[..., 0] * inv_z * inv_z], axis=-1),
            jnp.stack([zero, inv_z, -Xc[..., 1] * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )
    # dX_c/d delta with T <- T exp([u, w]):  du -> -I, dw -> skew(X_c)
    dXc_du = -jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), Xc.shape + (3,))
    dXc_dw = skew(Xc)
    Jc = jnp.concatenate(
        [dproj @ dXc_du, dproj @ dXc_dw], axis=-1
    )  # (F, P, 2, 6)
    # dX_c/dX = R^T
    Jp = jnp.einsum("fpij,fkj->fpik", dproj, R)   # (F, P, 2, 3)
    Jc = Jc * w[..., None, None]
    Jp = Jp * w[..., None, None]
    if huber_delta is not None:
        tiny = jnp.asarray(jnp.finfo(points.dtype).tiny ** 0.5, points.dtype)
        nrm = jnp.linalg.norm(r, axis=-1)                     # (F, P)
        wr = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(nrm, tiny)))
        r = r * wr[..., None]
        Jc = Jc * wr[..., None, None]
        Jp = Jp * wr[..., None, None]
    return r, Jc, Jp


def _prior_residuals(poses: SE3, points: Array, prob: BAProblem):
    """Information-weighted prior residuals.

    Pose prior residual is ``ln(prior^-1 . T)`` with an identity Jacobian
    approximation (exact at the prior mean; the anchor/regulator priors that
    gauge-fix the problem live at/near their means).
    """
    r_pose = prob.pose_prior.inverse().compose(poses).log()     # (F, 6)
    r_point = points - prob.point_prior                          # (P, 3)
    return r_pose, r_point


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _cost(poses: SE3, points: Array, prob: BAProblem,
          axis_name: str | None = None,
          huber_delta: float | None = None) -> Array:
    """Total cost. Under ``shard_map`` with landmark-sharded problems, the
    observation and point-prior terms are local sums psum'd across the mesh;
    the pose-prior term is replicated and added once. With ``huber_delta``
    the observation term is the Huber rho of the whitened residual norm
    (matching the IRLS reweighting in the normal equations)."""
    r, _, _ = _projection_residuals(poses, points, prob)
    rp, rx = _prior_residuals(poses, points, prob)
    if huber_delta is None:
        c_obs = 0.5 * jnp.sum(r * r)
    else:
        nrm = jnp.linalg.norm(r, axis=-1)
        rho = jnp.where(
            nrm <= huber_delta,
            0.5 * nrm * nrm,
            huber_delta * (nrm - 0.5 * huber_delta),
        )
        c_obs = jnp.sum(rho)
    c_point = 0.5 * jnp.sum(rx * jnp.einsum("pij,pj->pi", prob.point_prior_info, rx))
    c_pose = 0.5 * jnp.sum(rp * jnp.einsum("fij,fj->fi", prob.pose_prior_info, rp))
    return _psum(c_obs + c_point, axis_name) + c_pose


def _normal_equations(poses: SE3, points: Array, prob: BAProblem,
                      axis_name: str | None = None,
                      huber_delta: float | None = None):
    """Assemble the block normal equations.

    Returns (Hcc (F,6,6), Hpp (P,3,3), Hcp (F,P,6,3), bc (F,6), bp (P,3)).
    ``b = -J^T r``. Under a mesh axis, the pose blocks (Hcc, bc) are summed
    over landmark shards with psum; Hpp/Hcp/bp stay local to the shard.
    Pose priors (replicated) are added after the reduction.
    """
    r, Jc, Jp = _projection_residuals(poses, points, prob, huber_delta)
    Hcc = _psum(jnp.einsum("fpki,fpkj->fij", Jc, Jc), axis_name)
    Hpp = jnp.einsum("fpki,fpkj->pij", Jp, Jp)
    Hcp = jnp.einsum("fpki,fpkj->fpij", Jc, Jp)
    bc = _psum(-jnp.einsum("fpki,fpk->fi", Jc, r), axis_name)
    bp = -jnp.einsum("fpki,fpk->pi", Jp, r)
    # priors
    rp, rx = _prior_residuals(poses, points, prob)
    Hcc = Hcc + prob.pose_prior_info
    Hpp = Hpp + prob.point_prior_info
    bc = bc - jnp.einsum("fij,fj->fi", prob.pose_prior_info, rp)
    bp = bp - jnp.einsum("pij,pj->pi", prob.point_prior_info, rx)
    return Hcc, Hpp, Hcp, bc, bp


def _schur_solve(Hcc, Hpp, Hcp, bc, bp, lam, dtype,
                 axis_name: str | None = None):
    """Damped Schur-complement solve -> (delta_c (F,6), delta_p (P,3)).

    Landmark blocks are eliminated with batched closed-form 3x3 inverses —
    embarrassingly parallel across landmark shards. The reduced 6F x 6F
    camera system is assembled with one psum over the mesh (this is the
    Schur reduce of SURVEY §7) and solved replicated by dense Cholesky;
    back-substitution of the landmark deltas is shard-local again.
    """
    F = Hcc.shape[0]
    P = Hpp.shape[0]
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    Hcc_d = Hcc + lam * eye6[None]
    Hpp_d = Hpp + lam * eye3[None]
    Hpp_inv = linalg.inv3x3(Hpp_d)                               # (P, 3, 3)
    # S_{f g} = delta_fg Hcc_f - sum_p Hcp_{f p} Hpp_p^-1 Hcp_{g p}^T
    W = jnp.einsum("fpij,pjk->fpik", Hcp, Hpp_inv)               # (F, P, 6, 3)
    S_off = _psum(
        jnp.einsum("fpik,gpjk->fgij", W, Hcp), axis_name
    )                                                            # (F, F, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(F), jnp.arange(F)].add(Hcc_d)
    rhs = bc - _psum(jnp.einsum("fpik,pk->fi", W, bp), axis_name)  # (F, 6)
    S_flat = S.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
    rhs_flat = rhs.reshape(6 * F)
    # tiny diagonal jitter keeps Cholesky finite if a pose is unconstrained
    jitter = jnp.asarray(jnp.finfo(dtype).eps, dtype) * (
        1.0 + jnp.max(jnp.abs(jnp.diagonal(S_flat)))
    )
    delta_c = linalg.solve_psd(S_flat, rhs_flat, jitter=0.0)  # jitter folded below
    # fall back to jittered solve when the plain one goes non-finite
    bad = jnp.logical_not(jnp.all(jnp.isfinite(delta_c)))
    delta_c = jnp.where(
        bad,
        linalg.solve_psd(
            S_flat + jitter * jnp.eye(6 * F, dtype=dtype), rhs_flat
        ),
        delta_c,
    )
    delta_c = delta_c.reshape(F, 6)
    # back-substitute landmarks
    rhs_p = bp - jnp.einsum("fpij,fi->pj", Hcp, delta_c)
    delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, rhs_p)
    return delta_c, delta_p, S_flat, Hpp_inv, W


def _retract(poses: SE3, points: Array, delta_c: Array, delta_p: Array):
    return poses.compose(SE3.exp(delta_c)), points + delta_p


def ba_solve(
    prob: BAProblem,
    params: BAParams = BAParams(),
    axis_name: str | None = None,
) -> BAResult:
    """LM bundle adjustment (reference ``ba_frame_pose_and_point``,
    ``vision/ba.cpp:26-156``).

    ``axis_name``: when called inside ``shard_map`` with the landmark axis
    of ``prob`` sharded over that mesh axis (poses/pose-priors replicated),
    the same code runs the distributed Schur-complement LM — all cross-
    shard coupling goes through psums of 6Fx6F-sized blocks over ICI.
    """
    dtype = prob.points0.dtype

    def lm_step(state):
        poses_R, poses_t, points, lam, cost, it, done = state
        poses = SE3(poses_R, poses_t)
        Hcc, Hpp, Hcp, bc, bp = _normal_equations(
            poses, points, prob, axis_name, params.huber_delta
        )
        delta_c, delta_p, _, _, _ = _schur_solve(
            Hcc, Hpp, Hcp, bc, bp, lam, dtype, axis_name
        )
        new_poses, new_points = _retract(poses, points, delta_c, delta_p)
        new_cost = _cost(new_poses, new_points, prob, axis_name,
                         params.huber_delta)
        accept = jnp.logical_and(jnp.isfinite(new_cost), new_cost < cost)
        # damping schedule
        lam = jnp.clip(
            jnp.where(accept, lam * params.lambda_down, lam * params.lambda_up),
            params.lambda_min,
            params.lambda_max,
        )
        poses_R = jnp.where(accept, new_poses.R, poses_R)
        poses_t = jnp.where(accept, new_poses.t, poses_t)
        points = jnp.where(accept, new_points, points)
        # stop when the attempted step no longer moves the cost materially —
        # whether accepted (true convergence) or rejected at the numerical
        # floor (f32 fixed point of the damping schedule)
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        thresh = jnp.maximum(
            jnp.maximum(params.abs_decrease, params.rel_decrease * cost),
            10.0 * eps * (1.0 + cost),
        )
        converged = jnp.logical_and(
            jnp.isfinite(new_cost), jnp.abs(cost - new_cost) < thresh
        )
        # rejected step with saturated damping = the numerical floor of the
        # damping schedule (typical in f32): further iterations cannot move
        converged = jnp.logical_or(
            converged,
            jnp.logical_and(jnp.logical_not(accept),
                            lam >= params.lambda_max),
        )
        cost = jnp.where(accept, new_cost, cost)
        return poses_R, poses_t, points, lam, cost, it + 1, converged

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(it < params.max_iterations, jnp.logical_not(done))

    cost0 = _cost(prob.poses0, prob.points0, prob, axis_name,
                  params.huber_delta)
    state0 = (
        prob.poses0.R,
        prob.poses0.t,
        prob.points0,
        jnp.asarray(params.lambda_init, dtype),
        cost0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    poses_R, poses_t, points, lam, cost, it, done = jax.lax.while_loop(
        cond, lm_step, state0
    )
    poses = SE3(poses_R, poses_t)

    point_info = None
    if params.compute_point_info and not params.compute_covariance:
        _, point_info, _, _, _ = _normal_equations(
            poses, points, prob, axis_name
        )

    if params.compute_covariance:
        # marginal covariances at the solution (lambda = 0)
        Hcc, Hpp, Hcp, bc, bp = _normal_equations(
            poses, points, prob, axis_name, params.huber_delta
        )
        if params.compute_point_info:
            point_info = Hpp
        _, _, S_flat, Hpp_inv, W = _schur_solve(
            Hcc, Hpp, Hcp, bc, bp, jnp.asarray(0.0, dtype), dtype, axis_name
        )
        F = Hcc.shape[0]
        jitter = jnp.asarray(jnp.finfo(dtype).eps, dtype) * (
            1.0 + jnp.max(jnp.abs(jnp.diagonal(S_flat)))
        )
        Sigma_cc = linalg.inv_psd(
            S_flat + jitter * jnp.eye(6 * F, dtype=dtype)
        )
        Sigma_cc_blocks = Sigma_cc.reshape(F, 6, F, 6).transpose(0, 2, 1, 3)
        pose_cov = Sigma_cc_blocks[jnp.arange(F), jnp.arange(F)]  # (F, 6, 6)
        # Sigma_pp,i = Hpp_i^-1 + sum_{f g} (W_{f i})^T Sigma_cc[f,g] W_{g i}
        point_cov = Hpp_inv + jnp.einsum(
            "fpki,fgkl,gplj->pij", W, Sigma_cc_blocks, W
        )
    else:
        F = prob.poses0.R.shape[0]
        P = points.shape[0]
        pose_cov = jnp.zeros((F, 6, 6), dtype)
        point_cov = jnp.zeros((P, 3, 3), dtype)
    return BAResult(
        poses=poses,
        points=points,
        pose_covariance=pose_cov,
        point_covariance=point_cov,
        error=cost,
        iterations=it,
        converged=done,
        point_information=point_info,
    )
