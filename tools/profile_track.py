"""Cumulative-prefix timing of the fused tracking step on REAL tsukuba state.

Each prefix is jitted and timed with the true post-bootstrap state (synthetic
micro-benchmarks converge instantly and hide LM iteration cost); successive
differences give the per-stage device cost.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.frontend.vo_jit import VoJitParams, make_vo_replay, vo_init_state
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import klt, matching, pnp, ransac as ransac_mod, sfm
from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.ops.features import orb_detect

TSUKUBA = "/root/reference/data/tsukuba"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    p = VoJitParams()
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    imgs = [jax.device_put(load_image_grayscale(f"{TSUKUBA}/{i}.jpg"))
            for i in range(1, 6)]
    replay = make_vo_replay(p)
    state, _ = replay(vo_init_state(p), jnp.stack(imgs[:2]), K_inv, focal)
    jax.block_until_ready(state.pose_t)
    image = imgs[2]
    K_feat = p.orb.max_features
    M = p.map_capacity

    def stage_fn(stage):
        def fn(state, image, key):
            feats = orb_detect(image, p.orb)
            ones = jnp.ones_like(feats.xy[..., :1])
            rays = jnp.concatenate([feats.xy, ones], -1) @ K_inv.T
            smooth = klt.smooth_image(image)
            tmpl = klt.extract_templates(smooth, feats.xy)
            if stage == "preprocess":
                return rays.sum() + tmpl.sum()
            m = matching.match_features(
                feats.desc, feats.mask, state.map_desc, state.map_valid,
                max_distance=p.max_match_distance)
            if stage == "match":
                return m.idx.sum()
            kr = klt.klt_track(state.map_tmpl[m.idx], smooth, feats.xy, m.mask)
            obs_rays = jnp.concatenate(
                [kr.xy, jnp.ones_like(kr.xy[..., :1])], -1) @ K_inv.T
            obs_sigma = jnp.where(kr.valid, p.klt_sigma_px / focal, feats.sigma / focal)
            if stage == "klt":
                return obs_rays.sum()
            if stage == "klt+gather":
                return obs_rays.sum() + state.map_pos[m.idx].sum()
            map_pts = state.map_pos[m.idx]
            thr_sq = (p.pnp_reproj_px / focal) ** 2
            # pnp_ransac_core sub-stages (Grunert P3P path, ops/pnp.py:221)
            from mvslam_tpu.ops import p3p as p3p_mod
            idx3 = ransac_mod.sample_minimal_sets(key, m.mask, p.pnp_hypotheses, 3)
            Xs, rs = map_pts[idx3], obs_rays[idx3]
            bear = rs / jnp.maximum(
                jnp.linalg.norm(rs, axis=-1, keepdims=True), 1e-20)
            if stage == "pnp_sample":
                return Xs.sum() + bear.sum()
            cand, cand_valid = p3p_mod.p3p_solve(Xs, bear)
            if stage == "pnp_p3p":
                return cand.t.sum()
            Hh = p.pnp_hypotheses
            C = cand_valid.shape[-1]
            poses_h = SE3(cand.R.reshape(Hh * C, 3, 3), cand.t.reshape(Hh * C, 3))
            flat_valid = cand_valid.reshape(Hh * C)
            errs = pnp.reprojection_error_sq(
                SE3(poses_h.R[:, None], poses_h.t[:, None]),
                map_pts[None], obs_rays[None])
            errs = jnp.where(flat_valid[:, None], errs, jnp.inf)
            if stage == "pnp_errs":
                return errs.sum()
            best, inl, _ = ransac_mod._select_best(errs, m.mask, thr_sq)
            if stage == "pnp_select":
                return best + inl.sum()
            pose0, best_inl = pnp.pnp_ransac_core(
                map_pts, obs_rays, m.mask, key, p.pnp_hypotheses, thr_sq)
            if stage == "pnp":
                return pose0.t.sum()
            lm = matching.match_features(
                state.lf_desc, state.lf_mask, feats.desc, feats.mask,
                max_distance=p.max_match_distance)
            kr2 = klt.klt_track(state.lf_tmpl, smooth, feats.xy[lm.idx], lm.mask)
            r_new = jnp.concatenate(
                [kr2.xy, jnp.ones_like(kr2.xy[..., :1])], -1) @ K_inv.T
            last_pose = SE3(state.pose_R, state.pose_t)
            rel = last_pose.inverse().compose(pose0)
            pts_last, tri_mask = sfm.sfm_triangulate(
                state.lf_rays, r_new, lm.mask, rel)
            if stage == "tri":
                return pts_last.sum() + r_new.sum()
            # BA with real shapes (old map points + new triangulations)
            cap = p.ba_old + p.ba_new
            err_p = pnp.reprojection_error_sq(pose0, map_pts, obs_rays)
            best_inl = jnp.logical_and(err_p < thr_sq, m.mask)
            order = jnp.argsort(jnp.logical_not(best_inl), stable=True)
            old_idx = order[:p.ba_old]
            old_ok = best_inl[old_idx]
            pts0 = jnp.zeros((cap, 3), jnp.float32)
            pts0 = pts0.at[:p.ba_old].set(map_pts[old_idx])
            pts0 = pts0.at[p.ba_old:].set(
                last_pose.apply(pts_last)[:p.ba_new])
            obs = jnp.zeros((2, cap, 2), jnp.float32)
            obs = obs.at[1, :p.ba_old].set(obs_rays[old_idx, :2])
            obs = obs.at[0, p.ba_old:].set(state.lf_rays[:p.ba_new, :2])
            obs = obs.at[1, p.ba_old:].set(r_new[:p.ba_new, :2])
            obs_mask = jnp.zeros((2, cap), bool)
            obs_mask = obs_mask.at[1, :p.ba_old].set(old_ok)
            obs_mask = obs_mask.at[0, p.ba_old:].set(tri_mask[:p.ba_new])
            obs_mask = obs_mask.at[1, p.ba_old:].set(tri_mask[:p.ba_new])
            weight = jnp.full((2, cap), 1400.0, jnp.float32)
            point_info = jnp.zeros((cap, 3, 3), jnp.float32)
            point_info = point_info.at[:p.ba_old].set(
                jnp.where(old_ok[:, None, None],
                          jnp.eye(3) / (p.map_point_stddev ** 2), 0.0))
            poses0 = SE3(jnp.stack([state.pose_R, pose0.R]),
                         jnp.stack([state.pose_t, pose0.t]))
            pose_prior_info = jnp.stack(
                [1e10 * jnp.eye(6, dtype=jnp.float32), jnp.zeros((6, 6), jnp.float32)])
            prob = ba_mod.BAProblem.create(
                poses0=poses0, points0=pts0, obs=obs, obs_mask=obs_mask,
                obs_weight=weight, pose_prior=poses0,
                pose_prior_info=pose_prior_info,
                point_prior=pts0, point_prior_info=point_info)
            iters = {"ba5": 5, "ba10": 10, "ba25": 25}[stage]
            result = ba_mod.ba_solve(prob, ba_mod.BAParams(
                max_iterations=iters, compute_covariance=False,
                compute_point_info=True))
            return result.poses.t.sum() + result.points.sum()
        return jax.jit(fn)

    key = jax.random.PRNGKey(7)
    prev = 0.0
    for stage in ["preprocess", "match", "klt", "klt+gather", "pnp_sample",
                  "pnp_p3p", "pnp_errs", "pnp_select", "pnp",
                  "tri", "ba5", "ba10", "ba25"]:
        fn = stage_fn(stage)
        out = fn(state, image, key)
        jax.block_until_ready(out)
        reps = 30
        t0 = time.time()
        for _ in range(reps):
            out = fn(state, image, key)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1e3
        log(f"{stage:12s} cum={dt:7.2f} ms  (+{dt - prev:6.2f})")
        if not stage.startswith("ba"):
            prev = dt


if __name__ == "__main__":
    main()
