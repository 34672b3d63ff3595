"""Synthetic multi-frame BA / pose-graph problem generators.

Used by the distributed tests and benchmarks (BASELINE configs: windowed BA
over keyframe sequences, large maps with many landmarks). Pure JAX; seeds
are explicit so 1-shard and N-shard runs see identical problems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import ba_sparse

Array = jax.Array


def make_window_ba_problem(
    key: Array,
    num_frames: int = 8,
    num_points: int = 512,
    noise: float = 1e-3,
    init_noise: float = 1e-2,
    anchor_stddev: float = 1e-5,
    point_stddev: float = 0.1,
    dtype=jnp.float32,
) -> tuple[ba_mod.BAProblem, SE3, Array]:
    """A sliding-window BA problem: a camera translating in +x observing a
    random point cloud in front; noisy observations, perturbed initial
    poses/points, frame-0 anchored, weak point regulators for the gauge.

    Returns (problem, true_poses, true_points).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # ground truth: poses marching +x, slight jitter in y/z
    xs = jnp.arange(num_frames, dtype=dtype) * 0.5
    t = jnp.stack([xs, 0.02 * jnp.sin(xs), 0.01 * jnp.cos(xs)], axis=-1)
    poses_true = SE3(
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), (num_frames, 3, 3)), t
    )
    # points spread in front of the trajectory
    span_x = 0.5 * num_frames
    pts_xy = jax.random.uniform(
        k1, (num_points, 2), dtype, -2.0, 2.0
    ) + jnp.stack(
        [jax.random.uniform(k2, (num_points,), dtype, 0.0, span_x),
         jnp.zeros((num_points,), dtype)], axis=-1,
    )
    depth = jax.random.uniform(k3, (num_points,), dtype, 4.0, 12.0)
    pts_true = jnp.concatenate([pts_xy, depth[:, None]], axis=-1)

    # observations
    Xc = jnp.einsum(
        "fji,fpj->fpi", poses_true.R,
        pts_true[None] - poses_true.t[:, None, :],
    )
    proj = Xc[..., :2] / Xc[..., 2:3]
    obs = proj + noise * jax.random.normal(k4, proj.shape, dtype)
    obs_mask = Xc[..., 2] > 0.5

    # perturbed initialization
    kp, kx = jax.random.split(k5)
    dpose = init_noise * jax.random.normal(kp, (num_frames, 6), dtype)
    dpose = dpose.at[0].set(0.0)                      # anchor stays put
    poses0 = poses_true.compose(SE3.exp(dpose))
    points0 = pts_true + init_noise * jax.random.normal(kx, pts_true.shape, dtype)

    pose_prior_info = jnp.zeros((num_frames, 6, 6), dtype)
    pose_prior_info = pose_prior_info.at[0].set(
        jnp.eye(6, dtype=dtype) / (anchor_stddev**2)
    )
    point_prior_info = jnp.broadcast_to(
        jnp.eye(3, dtype=dtype) / (point_stddev**2), (num_points, 3, 3)
    )
    prob = ba_mod.BAProblem.create(
        poses0=poses0,
        points0=points0,
        obs=obs,
        obs_mask=obs_mask,
        obs_weight=jnp.full((num_frames, num_points), 1.0 / noise, dtype),
        pose_prior=poses0,
        pose_prior_info=pose_prior_info,
        point_prior=points0,
        point_prior_info=point_prior_info,
    )
    return prob, poses_true, pts_true


def make_sequence_ba_problem(
    key: Array,
    num_frames: int = 64,
    points_per_frame: int = 32,
    window: int = 4,
    noise: float = 1e-3,
    init_noise: float = 1e-2,
    anchor_stddev: float = 1e-5,
    point_stddev: float = 0.5,
    dtype=jnp.float32,
) -> tuple[ba_sparse.SparseBAProblem, SE3, Array]:
    """A long-sequence SLAM problem in fixed-degree sparse form.

    Ground truth: a camera marching +x past a corridor of landmarks; each
    landmark is anchored at one keyframe and observed by the next ``window``
    keyframes (degree D = window observation lists). Landmarks are emitted
    ORDERED BY ANCHOR KEYFRAME, so an equal landmark split over a mesh is a
    contiguous partition of the keyframe sequence (the sequence-parallel
    layout of ``parallel/dist_ba_sparse.py``). Representable at BASELINE
    scale: storage is O(P * window), never O(F * P).

    Returns (problem, true_poses, true_points).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    F = num_frames
    Ppf = points_per_frame
    P = F * Ppf
    xs = jnp.arange(F, dtype=dtype) * 0.5
    t = jnp.stack([xs, 0.02 * jnp.sin(xs), 0.01 * jnp.cos(xs)], axis=-1)
    poses_true = SE3(jnp.broadcast_to(jnp.eye(3, dtype=dtype), (F, 3, 3)), t)

    # landmarks: anchored at frame i, spread laterally, 4-12 ahead in depth
    anchor = jnp.repeat(jnp.arange(F, dtype=jnp.int32), Ppf)       # (P,)
    lateral = jax.random.uniform(k1, (P, 2), dtype, -2.0, 2.0)
    depth = jax.random.uniform(k2, (P,), dtype, 4.0, 12.0)
    pts_true = jnp.stack(
        [xs[anchor] + lateral[:, 0], lateral[:, 1], depth], axis=-1
    )

    # observation lists: frames anchor .. anchor+window-1 (clipped)
    offs = jnp.arange(window, dtype=jnp.int32)
    obs_frame = jnp.minimum(anchor[:, None] + offs[None, :], F - 1)  # (P, W)
    Rg = poses_true.R[obs_frame]
    tg = poses_true.t[obs_frame]
    Xc = jnp.einsum("pdji,pdj->pdi", Rg, pts_true[:, None, :] - tg)
    proj = Xc[..., :2] / Xc[..., 2:3]
    obs = proj + noise * jax.random.normal(k3, proj.shape, dtype)
    # mask: positive depth, in a loose fov, and no duplicated (clipped) frames
    first = jnp.concatenate(
        [jnp.ones_like(obs_frame[:, :1], bool),
         obs_frame[:, 1:] != obs_frame[:, :-1]], axis=1
    )
    obs_mask = (Xc[..., 2] > 0.5) & (jnp.abs(proj) < 3.0).all(-1) & first

    kp, kx = jax.random.split(k4)
    dpose = init_noise * jax.random.normal(kp, (F, 6), dtype)
    dpose = dpose.at[0].set(0.0)
    poses0 = poses_true.compose(SE3.exp(dpose))
    points0 = pts_true + init_noise * jax.random.normal(kx, pts_true.shape, dtype)

    pose_prior_info = jnp.zeros((F, 6, 6), dtype)
    pose_prior_info = pose_prior_info.at[0].set(
        jnp.eye(6, dtype=dtype) / (anchor_stddev**2)
    )
    point_prior_info = jnp.broadcast_to(
        jnp.eye(3, dtype=dtype) / (point_stddev**2), (P, 3, 3)
    )
    prob = ba_sparse.SparseBAProblem.create(
        poses0=poses0,
        points0=points0,
        obs_frame=obs_frame,
        obs=obs,
        obs_mask=obs_mask,
        obs_weight=jnp.full(obs_frame.shape, 1.0 / noise, dtype),
        pose_prior=poses0,
        pose_prior_info=pose_prior_info,
        point_prior=points0,
        point_prior_info=point_prior_info,
    )
    return prob, poses_true, pts_true
