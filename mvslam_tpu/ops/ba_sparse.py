"""Sparse (fixed-degree) bundle adjustment for large maps.

The dense :mod:`mvslam_tpu.ops.ba` materializes an (F, P) observation grid
and a dense 6F x 6F reduced camera system — right for 2-frame tracking BA,
unrepresentable at the BASELINE scaling configs (10k keyframes / 1M
landmarks would be a 10^10-entry obs tensor). This module is the scaling
path, replacing the reference's gtsam *sparse factor graph*
(``vision/ba.cpp:96-117``) the TPU way:

- **Fixed-degree observation lists**: each landmark stores up to D
  observations ``(obs_frame (P, D) int32, obs (P, D, 2), mask, weight)``.
  Storage is O(P*D), independent of F. D is static (typical tracks are
  4-8 frames long; longer tracks split rows).
- **Gather/segment-sum normal equations**: per-observation 2x6/2x3 Jacobian
  blocks are built batched by gathering poses per observation;
  frame-indexed reductions use ``segment_sum`` (XLA scatter-add).
- **Matrix-free PCG camera solve**: the reduced camera system
  ``S = Hcc - W Hpp^-1 W^T`` is never materialized (at 10k frames it would
  be 14 GB). CG applies ``S x`` through the same gather/scatter pipeline;
  block-Jacobi (6x6) preconditioning. This is the "inexact step" LM of
  large-scale BA, with fixed iteration counts for XLA.
- **Distribution = sequence partitioning**: shard the LANDMARK axis over the
  mesh. When landmarks are ordered by anchor keyframe (time), an equal
  split is a partition of the keyframe sequence: each shard owns a
  contiguous time block's landmarks and touches only its block's poses
  (+ the observation window's halo). Poses are replicated (6F floats —
  tiny); all cross-shard coupling is psums of (F, 6)/(F, 6, 6) blocks over
  ICI, once per CG application. The SP/CP row of SURVEY §2.8.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import SE3, skew

Array = jax.Array


class SparseBAProblem(NamedTuple):
    """F frames, P landmarks, degree-D observation lists per landmark."""

    poses0: SE3                 # (F,) camera-to-world
    points0: Array              # (P, 3)
    obs_frame: Array            # (P, D) int32 frame index of each observation
    obs: Array                  # (P, D, 2) ideal-plane measurements
    obs_mask: Array             # (P, D) bool
    obs_weight: Array           # (P, D) 1/sigma
    pose_prior: SE3             # (F,)
    pose_prior_info: Array      # (F, 6, 6)
    point_prior: Array          # (P, 3)
    point_prior_info: Array     # (P, 3, 3)

    @staticmethod
    def create(
        poses0: SE3,
        points0: Array,
        obs_frame: Array,
        obs: Array,
        obs_mask: Array,
        obs_weight: Array | None = None,
        pose_prior: SE3 | None = None,
        pose_prior_info: Array | None = None,
        point_prior: Array | None = None,
        point_prior_info: Array | None = None,
    ) -> "SparseBAProblem":
        dtype = points0.dtype
        F = poses0.t.shape[0]
        P, D = obs_frame.shape
        if obs_weight is None:
            obs_weight = jnp.ones((P, D), dtype)
        if pose_prior is None:
            pose_prior = SE3.identity((F,), dtype=dtype)
        if pose_prior_info is None:
            pose_prior_info = jnp.zeros((F, 6, 6), dtype)
        if point_prior is None:
            point_prior = jnp.zeros((P, 3), dtype)
        if point_prior_info is None:
            point_prior_info = jnp.zeros((P, 3, 3), dtype)
        return SparseBAProblem(
            poses0, points0, jnp.asarray(obs_frame, jnp.int32), obs,
            jnp.asarray(obs_mask, bool), obs_weight,
            pose_prior, pose_prior_info, point_prior, point_prior_info,
        )

    @property
    def num_frames(self) -> int:
        return self.poses0.t.shape[0]


class SparseBAParams(NamedTuple):
    max_iterations: int = 30
    cg_iterations: int = 40
    cg_tol: float = 1e-6        # relative residual; freezes converged systems
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    lambda_min: float = 1e-12
    lambda_max: float = 1e8
    rel_decrease: float = 1e-8


class SparseBAResult(NamedTuple):
    poses: SE3
    points: Array
    error: Array
    iterations: Array
    converged: Array


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _residuals(poses: SE3, points: Array, prob: SparseBAProblem):
    """Weighted residuals + Jacobians per observation.

    Returns r (P, D, 2), Jc (P, D, 2, 6), Jp (P, D, 2, 3) — pre-masked and
    pre-weighted. Pose data is gathered per observation: (P, D, 3, 3) /
    (P, D, 3) gathers instead of an (F, P) cross product.
    """
    f = prob.obs_frame                                  # (P, D)
    R = poses.R[f]                                      # (P, D, 3, 3)
    t = poses.t[f]                                      # (P, D, 3)
    diff = points[:, None, :] - t
    Xc = jnp.einsum("pdji,pdj->pdi", R, diff)
    z = Xc[..., 2]
    eps = jnp.asarray(jnp.finfo(points.dtype).eps, points.dtype)
    safe_z = jnp.where(jnp.abs(z) < 1e3 * eps, 1e3 * eps, z)
    proj = Xc[..., :2] / safe_z[..., None]
    w = jnp.where(prob.obs_mask, prob.obs_weight, 0.0)
    r = (proj - prob.obs) * w[..., None]

    inv_z = 1.0 / safe_z
    zero = jnp.zeros_like(inv_z)
    dproj = jnp.stack(
        [
            jnp.stack([inv_z, zero, -Xc[..., 0] * inv_z * inv_z], axis=-1),
            jnp.stack([zero, inv_z, -Xc[..., 1] * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )                                                   # (P, D, 2, 3)
    dXc_du = -jnp.broadcast_to(
        jnp.eye(3, dtype=points.dtype), Xc.shape + (3,)
    )
    dXc_dw = skew(Xc)
    Jc = jnp.concatenate([dproj @ dXc_du, dproj @ dXc_dw], axis=-1)
    Jp = jnp.einsum("pdij,pdkj->pdik", dproj, R)
    Jc = Jc * w[..., None, None]
    Jp = Jp * w[..., None, None]
    return r, Jc, Jp


def _cost(poses: SE3, points: Array, prob: SparseBAProblem,
          axis_name: str | tuple[str, ...] | None = None) -> Array:
    r, _, _ = _residuals(poses, points, prob)
    rx = points - prob.point_prior
    rp = prob.pose_prior.inverse().compose(poses).log()
    c_local = 0.5 * jnp.sum(r * r) + 0.5 * jnp.sum(
        rx * jnp.einsum("pij,pj->pi", prob.point_prior_info, rx)
    )
    c_pose = 0.5 * jnp.sum(
        rp * jnp.einsum("fij,fj->fi", prob.pose_prior_info, rp)
    )
    return _psum(c_local, axis_name) + c_pose


def _segment6(x: Array, seg: Array, F: int) -> Array:
    """segment-sum of (N, ...) rows into (F, ...) by frame index."""
    return jax.ops.segment_sum(x, seg, num_segments=F)


class _Assembled(NamedTuple):
    Hcc: Array          # (F, 6, 6) block-diagonal camera Hessian (+prior)
    Hpp_inv: Array      # (P, 3, 3) damped inverted landmark blocks
    A: Array            # (P, D, 6, 3) Jc^T Jp coupling blocks
    bc: Array           # (F, 6)
    bp: Array           # (P, 3)
    seg: Array          # (P*D,) flattened frame indices


def _assemble(poses: SE3, points: Array, prob: SparseBAProblem, lam,
              axis_name: str | tuple[str, ...] | None = None) -> _Assembled:
    dtype = points.dtype
    F = prob.num_frames
    P, D = prob.obs_frame.shape
    r, Jc, Jp = _residuals(poses, points, prob)
    seg = prob.obs_frame.reshape(P * D)
    # camera blocks: scatter-add per observation into the (F, 6, 6) diagonal
    HccO = jnp.einsum("pdki,pdkj->pdij", Jc, Jc).reshape(P * D, 6, 6)
    Hcc = _psum(_segment6(HccO, seg, F), axis_name) + prob.pose_prior_info
    bcO = -jnp.einsum("pdki,pdk->pdi", Jc, r).reshape(P * D, 6)
    rp = prob.pose_prior.inverse().compose(poses).log()
    bc = _psum(_segment6(bcO, seg, F), axis_name) - jnp.einsum(
        "fij,fj->fi", prob.pose_prior_info, rp
    )
    # landmark blocks (shard-local)
    Hpp = jnp.einsum("pdki,pdkj->pij", Jp, Jp) + prob.point_prior_info
    rx = points - prob.point_prior
    bp = -jnp.einsum("pdki,pdk->pi", Jp, r) - jnp.einsum(
        "pij,pj->pi", prob.point_prior_info, rx
    )
    Hpp_d = Hpp + lam * jnp.eye(3, dtype=dtype)
    Hpp_inv = linalg.inv3x3(Hpp_d)
    A = jnp.einsum("pdki,pdkj->pdij", Jc, Jp)           # (P, D, 6, 3)
    Hcc_d = Hcc + lam * jnp.eye(6, dtype=dtype)
    return _Assembled(Hcc_d, Hpp_inv, A, bc, bp, seg)


def _schur_matvec(asm: _Assembled, x: Array, F: int,
                  axis_name: str | tuple[str, ...] | None = None) -> Array:
    """Apply the reduced camera system ``S x`` without materializing S.

    ``S x = Hcc_d x - sum_p A_p Hpp_inv_p A_p^T x`` where ``A_p^T x``
    gathers x rows by each observation's frame and the outer product
    scatters back. One psum per application under sharding.
    """
    P, D = asm.A.shape[:2]
    xg = x[asm.seg.reshape(P, D)]                        # (P, D, 6)
    y = jnp.einsum("pdij,pdi->pj", asm.A, xg)            # (P, 3)
    z = jnp.einsum("pij,pj->pi", asm.Hpp_inv, y)         # (P, 3)
    wback = jnp.einsum("pdij,pj->pdi", asm.A, z)         # (P, D, 6)
    coupling = _psum(
        _segment6(wback.reshape(P * D, 6), asm.seg, F), axis_name
    )
    return jnp.einsum("fij,fj->fi", asm.Hcc, x) - coupling


def _pcg(asm: _Assembled, rhs: Array, F: int, params: SparseBAParams,
         axis_name: str | tuple[str, ...] | None = None) -> Array:
    """Block-Jacobi preconditioned CG on the reduced camera system.

    Fixed iteration count (static for XLA); iterations past convergence are
    frozen with a where-mask on the relative residual.
    """
    dtype = rhs.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    jitter = jnp.asarray(jnp.finfo(dtype).eps, dtype) * (
        1.0 + jnp.max(jnp.abs(asm.Hcc))
    )
    Minv = linalg.inv_psd(asm.Hcc + jitter * eye6[None])  # (F, 6, 6)

    def precond(v):
        return jnp.einsum("fij,fj->fi", Minv, v)

    x = jnp.zeros_like(rhs)
    r = rhs                                # S x0 = 0
    zv = precond(r)
    p = zv
    rz = jnp.sum(r * zv)
    r0 = jnp.sqrt(jnp.sum(rhs * rhs))
    tol2 = (params.cg_tol * r0) ** 2

    def body(_, carry):
        x, r, p, rz = carry
        live = jnp.sum(r * r) > tol2
        Sp = _schur_matvec(asm, p, F, axis_name)
        denom = jnp.sum(p * Sp)
        alpha = jnp.where(
            jnp.abs(denom) > 0, rz / denom, jnp.zeros_like(rz)
        )
        alpha = jnp.where(live & jnp.isfinite(alpha), alpha, 0.0)
        x = x + alpha * p
        r_new = r - alpha * Sp
        z_new = precond(r_new)
        rz_new = jnp.sum(r_new * z_new)
        beta = jnp.where(rz > 0, rz_new / rz, jnp.zeros_like(rz))
        beta = jnp.where(live & jnp.isfinite(beta), beta, 0.0)
        p = jnp.where(live, z_new + beta * p, p)
        r = jnp.where(live, r_new, r)
        rz = jnp.where(live, rz_new, rz)
        return x, r, p, rz

    x, _, _, _ = jax.lax.fori_loop(
        0, params.cg_iterations, body, (x, r, p, rz)
    )
    return x


def sparse_ba_solve(
    prob: SparseBAProblem,
    params: SparseBAParams = SparseBAParams(),
    axis_name: str | tuple[str, ...] | None = None,
) -> SparseBAResult:
    """LM with inexact (PCG) Schur steps over fixed-degree observations.

    ``axis_name``: inside ``shard_map`` with the landmark axis of ``prob``
    sharded (poses/pose-priors replicated), the identical code runs the
    distributed solve; cross-shard traffic is one (F,6,6)+(F,6) psum per
    assembly and one (F,6) psum per CG application. A tuple of axis names
    reduces over several mesh axes at once — the hybrid ``(dcn, ici)``
    layout of ``parallel.dist_ba_sparse.distributed_sparse_ba_solve_hybrid``
    passes ``("dcn", "ici")`` so XLA lowers the psum hierarchically
    (intra-host partials on ICI, one cross-host hop on DCN).
    """
    dtype = prob.points0.dtype
    F = prob.num_frames

    def lm_step(state):
        poses_R, poses_t, points, lam, cost, it, done = state
        poses = SE3(poses_R, poses_t)
        asm = _assemble(poses, points, prob, lam, axis_name)
        # reduced (Schur) RHS: bc - W Hpp^-1 bp, scattered by frame
        P, D = prob.obs_frame.shape
        yb = jnp.einsum("pij,pj->pi", asm.Hpp_inv, asm.bp)       # (P, 3)
        red = jnp.einsum("pdij,pj->pdi", asm.A, yb)              # (P, D, 6)
        rhs = asm.bc - _psum(
            _segment6(red.reshape(P * D, 6), asm.seg, F), axis_name
        )
        delta_c = _pcg(asm, rhs, F, params, axis_name)
        # landmark back-substitution (shard-local)
        xg = delta_c[asm.seg.reshape(P, D)]
        rhs_p = asm.bp - jnp.einsum("pdij,pdi->pj", asm.A, xg)
        delta_p = jnp.einsum("pij,pj->pi", asm.Hpp_inv, rhs_p)
        new_poses = poses.compose(SE3.exp(delta_c))
        new_points = points + delta_p
        new_cost = _cost(new_poses, new_points, prob, axis_name)
        accept = jnp.logical_and(jnp.isfinite(new_cost), new_cost < cost)
        lam = jnp.clip(
            jnp.where(accept, lam * params.lambda_down,
                      lam * params.lambda_up),
            params.lambda_min, params.lambda_max,
        )
        poses_R = jnp.where(accept, new_poses.R, poses_R)
        poses_t = jnp.where(accept, new_poses.t, poses_t)
        points = jnp.where(accept, new_points, points)
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        thresh = jnp.maximum(
            params.rel_decrease * cost, 10.0 * eps * (1.0 + cost)
        )
        converged = jnp.logical_and(
            jnp.isfinite(new_cost), jnp.abs(cost - new_cost) < thresh
        )
        converged = jnp.logical_or(
            converged,
            jnp.logical_and(jnp.logical_not(accept),
                            lam >= params.lambda_max),
        )
        cost = jnp.where(accept, new_cost, cost)
        return poses_R, poses_t, points, lam, cost, it + 1, converged

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(
            it < params.max_iterations, jnp.logical_not(done)
        )

    cost0 = _cost(prob.poses0, prob.points0, prob, axis_name)
    state0 = (
        prob.poses0.R, prob.poses0.t, prob.points0,
        jnp.asarray(params.lambda_init, dtype), cost0,
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    poses_R, poses_t, points, lam, cost, it, done = jax.lax.while_loop(
        cond, lm_step, state0
    )
    return SparseBAResult(
        poses=SE3(poses_R, poses_t),
        points=points,
        error=cost,
        iterations=it,
        converged=done,
    )


def densify(prob: SparseBAProblem) -> "object":
    """Convert to a dense :class:`mvslam_tpu.ops.ba.BAProblem` (testing
    oracle only — O(F*P) memory)."""
    from mvslam_tpu.ops import ba as ba_mod

    F = prob.num_frames
    P, D = prob.obs_frame.shape
    dtype = prob.points0.dtype
    obs = jnp.zeros((F, P, 2), dtype)
    mask = jnp.zeros((F, P), bool)
    weight = jnp.ones((F, P), dtype)
    f = prob.obs_frame                                   # (P, D)
    pidx = jnp.broadcast_to(jnp.arange(P)[:, None], (P, D))
    fM = jnp.where(prob.obs_mask, f, F)                  # drop masked
    obs = obs.at[fM, pidx].set(prob.obs, mode="drop")
    mask = mask.at[fM, pidx].set(prob.obs_mask, mode="drop")
    weight = weight.at[fM, pidx].set(prob.obs_weight, mode="drop")
    return ba_mod.BAProblem.create(
        poses0=prob.poses0, points0=prob.points0,
        obs=obs, obs_mask=mask, obs_weight=weight,
        pose_prior=prob.pose_prior, pose_prior_info=prob.pose_prior_info,
        point_prior=prob.point_prior,
        point_prior_info=prob.point_prior_info,
    )
