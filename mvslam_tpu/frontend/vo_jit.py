"""Fully-fused on-device visual odometry: ``step(state, image) -> state'``.

The TPU-first inversion of the reference's mutex-guarded object
(``front-end/visual-odometer.{hpp,cpp}``) and of our own host-orchestrated
:class:`mvslam_tpu.frontend.visual_odometer.VisualOdometer`: the ENTIRE
per-frame pipeline — ORB pyramid, descriptor matching, KLT refinement,
RANSAC, triangulation, two-frame bundle adjustment, map update, mode
switching — is one jitted computation over a fixed-shape array state. One
dispatch per frame instead of ~8, no host round-trips inside a frame (the
host VisualOdometer costs ~2 s/frame through a remote-TPU tunnel; this path
is latency-bound by a single transfer).

State machine (reference INITIALIZING/TRACKING, ``visual-odometer.hpp:
89-93``) as ``lax.switch`` over three modes:

- 0 EMPTY: record the frame, wait for a second one;
- 1 INITIALIZING: two-view bootstrap against a RING of the last
  ``init_window`` frames, all slots solved in one vmapped batch and the
  oldest (longest-baseline) passing slot accepted — the reference's
  10-frame initialization queue (``visual-odometer.cpp:273-346``) without
  its sequential pair scan;
- 2 TRACKING: map association -> KLT -> PnP-RANSAC -> triangulate new
  points -> anchored two-frame BA -> gated commit, or reset to mode 1.

Capacity conventions: K features/frame, M map points, BA over
(BA_OLD + BA_NEW) points per step — all static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import klt, matching, pnp, sfm
from mvslam_tpu.ops.features import OrbParams, orb_detect

Array = jax.Array

MODE_EMPTY = 0
MODE_INITIALIZING = 1
MODE_TRACKING = 2


class VoJitParams(NamedTuple):
    """Static configuration (hashable; goes into the jit cache key)."""

    orb: OrbParams = OrbParams()
    map_capacity: int = 1024
    ba_old: int = 384            # map points per BA
    ba_new: int = 128            # fresh triangulations per BA
    # bootstrap window: ring of previous frames tried longest-baseline
    # (oldest) first, reference visual-odometer.cpp:273-346 (queue of 10).
    # All slots are evaluated in one vmapped batch; 4 slots covers a
    # several-frame stall/garbage gap at bounded compile cost.
    init_window: int = 4
    max_match_distance: int = 64
    ransac_hypotheses: int = 256
    max_error_sq: float = sfm.MAX_ERROR_SQ       # pixel-ish; / focal^2
    klt_sigma_px: float = 0.25
    min_pair_inliers: int = 20
    # refined-pair mean-error gate. Seeds VoJitState.gate_pair_err — a
    # TRACED scalar in the state, not a jit-cache key — so variants that
    # differ only in this gate share one compiled executable (tests
    # exercise three gate values against a single compile; a static param
    # here forced three full fused-step compilations in one session, which
    # aborted the XLA CPU compiler under the full suite's load)
    max_pair_mean_error: float = 9.0
    max_pair_rotation: float = 0.1
    max_pair_z_translation: float = 0.1
    min_track_inliers: int = 7
    # PnP-RANSAC + BA inlier gate. 0.75 px measured best on the tsukuba
    # envelope (r4 sweep: 2.0 px -> ate 0.038, 1.0 -> 0.020, 0.75 ->
    # 0.0185, 0.5 -> 0.025): the tight gate keeps marginal associations
    # out of the two-frame BA, whose template-anchored observations are
    # weighted hard enough that one bad association shifts the scale
    pnp_reproj_px: float = 0.75
    max_track_mean_error: float = 9.0
    map_point_stddev: float = 0.05
    # 10 LM iterations: the two-frame solve is warm-started from PnP and
    # the previous map, and converges in far fewer than the old cap of 25
    # (r4 sweep: 25 -> ate 0.0185 at 131 fps, 10 -> 0.0181 at 160 fps,
    # 8 -> 0.0170 at 164 fps; 10 keeps convergence margin on harder
    # scenes — the 110-frame synthetic sequence tracks 98% at 10)
    ba_iterations: int = 10
    # P3P minimal sets are 3 points: at a (pessimistic) 50% inlier rate a
    # hypothesis is all-inlier with p=1/8, so 128 hypotheses miss with
    # (1-1/8)^128 ~ 4e-8 — half the RANSAC cost of 256 for free (the
    # essential-matrix solver keeps 256: its 8-point sets need the depth)
    pnp_hypotheses: int = 128
    # KLT subpixel refinement of matched observations (A/B-able: the
    # reference uses raw ORB keypoint positions only)
    use_klt: bool = True
    # sigma for template-anchor observations: the map point is DEFINED as
    # the scene point imaged at the template center, so that observation
    # is exact by construction (only jpeg/interp noise); weighting it at
    # its true near-zero sigma stops integer-corner quantization from
    # leaking into the two-view geometry (bas-relief rotation/translation
    # ambiguity scales all map depths otherwise)
    template_sigma_px: float = 0.02
    # Huber threshold (whitened sigmas) for the two-frame BAs; None = pure
    # Gaussian (reference parity — gtsam without robust kernels)
    huber_delta: float | None = None
    # consistency gate on FRESH triangulations (see do_track): reprojection
    # onto both parent rays must be within this many pixels. VERY loose on
    # purpose — it exists to reject grossly inconsistent ray pairs
    # (occlusion boundaries, depth switches: residuals of tens of px whose
    # anchored-BA terms blow the reset gate; the 100-frame synthetic
    # sequence goes from ~60% tracked to 98% with this cut), NOT to
    # re-filter honest noise: tightening to <= 8 px measurably worsened
    # the tsukuba z-accuracy (0.019 -> 0.045) by dropping legitimate
    # high-residual parallax diversity
    tri_consistency_px: float = 16.0


class VoJitState(NamedTuple):
    """The whole tracker as fixed-shape device arrays (a pytree)."""

    mode: Array                 # () int32
    step: Array                 # () int32
    key: Array                  # PRNG key
    pose_R: Array               # (3, 3) last camera-to-world
    pose_t: Array               # (3,)
    # map
    map_pos: Array              # (M, 3)
    map_desc: Array             # (M, 8) uint32
    map_tmpl: Array             # (M, W, W)
    map_valid: Array            # (M,) bool
    map_seen: Array             # (M,) int32
    map_info: Array             # (M, 3, 3) landmark information (Hpp)
    # last frame
    lf_xy: Array                # (K, 2)
    lf_desc: Array              # (K, 8) uint32
    lf_mask: Array              # (K,) bool
    lf_rays: Array              # (K, 3)
    lf_sigma: Array             # (K,)
    lf_tmpl: Array              # (K, W, W)
    lf_obs_rays: Array          # (K, 3) refined observations
    lf_obs_sigma: Array         # (K,)
    lf_assoc: Array             # (K,) int32 feature -> map slot (-1 none)
    # bootstrap ring: B previous frames (INITIALIZING window)
    rb_xy: Array                # (B, K, 2)
    rb_desc: Array              # (B, K, 8) uint32
    rb_mask: Array              # (B, K) bool
    rb_rays: Array              # (B, K, 3)
    rb_sigma: Array             # (B, K)
    rb_tmpl: Array              # (B, K, W, W)
    rb_valid: Array             # (B,) bool
    rb_step: Array              # (B,) int32 — step when stored (age order)
    rb_pos: Array               # () int32 — next write slot (cyclic)
    # stats
    frame_total: Array          # () int32
    frame_tracked: Array        # () int32
    # traced gates (runtime-tunable without recompiling; see VoJitParams)
    gate_pair_err: Array        # () f32 — refined-pair mean-error gate


class VoStepOut(NamedTuple):
    success: Array              # () bool
    mode: Array                 # () int32 (after the step)
    pose_R: Array
    pose_t: Array
    num_inliers: Array          # () int32
    mean_error: Array           # () float32
    pnp_t: Array                # (3,) pre-BA PnP translation (diagnostics)
    # bootstrap diagnostics: ring slots refined by do_init's ranked walk
    # this step (0 = none passed the pre-gates, or not in INITIALIZING;
    # >1 = the fallback engaged past a slot that failed the error gate)
    init_tried: Array


def vo_init_state(params: VoJitParams, dtype=jnp.float32,
                  seed: int = 0) -> VoJitState:
    K = params.orb.max_features
    M = params.map_capacity
    W = klt.WINDOW
    B = params.init_window
    return VoJitState(
        mode=jnp.asarray(MODE_EMPTY, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        key=jax.random.PRNGKey(seed),
        pose_R=jnp.eye(3, dtype=dtype),
        pose_t=jnp.zeros(3, dtype),
        map_pos=jnp.zeros((M, 3), dtype),
        map_desc=jnp.zeros((M, 8), jnp.uint32),
        map_tmpl=jnp.zeros((M, W, W), dtype),
        map_valid=jnp.zeros(M, bool),
        map_seen=jnp.full(M, -1, jnp.int32),
        map_info=jnp.zeros((M, 3, 3), dtype),
        lf_xy=jnp.zeros((K, 2), dtype),
        lf_desc=jnp.zeros((K, 8), jnp.uint32),
        lf_mask=jnp.zeros(K, bool),
        lf_rays=jnp.zeros((K, 3), dtype),
        lf_sigma=jnp.ones(K, dtype),
        lf_tmpl=jnp.zeros((K, W, W), dtype),
        lf_obs_rays=jnp.zeros((K, 3), dtype),
        lf_obs_sigma=jnp.ones(K, dtype),
        lf_assoc=jnp.full(K, -1, jnp.int32),
        rb_xy=jnp.zeros((B, K, 2), dtype),
        rb_desc=jnp.zeros((B, K, 8), jnp.uint32),
        rb_mask=jnp.zeros((B, K), bool),
        rb_rays=jnp.zeros((B, K, 3), dtype),
        rb_sigma=jnp.ones((B, K), dtype),
        rb_tmpl=jnp.zeros((B, K, W, W), dtype),
        rb_valid=jnp.zeros(B, bool),
        rb_step=jnp.full(B, -1, jnp.int32),
        rb_pos=jnp.asarray(0, jnp.int32),
        frame_total=jnp.asarray(0, jnp.int32),
        frame_tracked=jnp.asarray(0, jnp.int32),
        gate_pair_err=jnp.asarray(params.max_pair_mean_error, dtype),
    )


def _masked_take(mask: Array, cap: int):
    """First ``cap`` true positions: (idx (cap,), valid (cap,))."""
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    idx = order[:cap]
    return idx, mask[idx]


def _allocate_slots(map_valid: Array, map_seen: Array, n: int) -> Array:
    """n slots: free ones first, then least-recently-seen."""
    keys = jnp.where(map_valid, map_seen, jnp.iinfo(jnp.int32).min)
    return jnp.argsort(keys)[:n]


class _FrameArrays(NamedTuple):
    xy: Array
    desc: Array
    mask: Array
    rays: Array
    sigma: Array
    tmpl: Array


def _store_frame(state: VoJitState, f: _FrameArrays,
                 obs_rays=None, obs_sigma=None, assoc=None) -> VoJitState:
    K = f.xy.shape[0]
    return state._replace(
        lf_xy=f.xy, lf_desc=f.desc, lf_mask=f.mask, lf_rays=f.rays,
        lf_sigma=f.sigma, lf_tmpl=f.tmpl,
        lf_obs_rays=f.rays if obs_rays is None else obs_rays,
        lf_obs_sigma=f.sigma if obs_sigma is None else obs_sigma,
        lf_assoc=jnp.full(K, -1, jnp.int32) if assoc is None else assoc,
    )


def _ring_push(state: VoJitState, f: _FrameArrays) -> VoJitState:
    """Store a frame in the bootstrap ring (cyclic, overwrites oldest)."""
    i = state.rb_pos
    return state._replace(
        rb_xy=state.rb_xy.at[i].set(f.xy),
        rb_desc=state.rb_desc.at[i].set(f.desc),
        rb_mask=state.rb_mask.at[i].set(f.mask),
        rb_rays=state.rb_rays.at[i].set(f.rays),
        rb_sigma=state.rb_sigma.at[i].set(f.sigma),
        rb_tmpl=state.rb_tmpl.at[i].set(f.tmpl),
        rb_valid=state.rb_valid.at[i].set(True),
        rb_step=state.rb_step.at[i].set(state.step),
        rb_pos=(state.rb_pos + 1) % state.rb_valid.shape[0],
    )


def _ring_clear(state: VoJitState) -> VoJitState:
    B = state.rb_valid.shape[0]
    return state._replace(
        rb_valid=jnp.zeros(B, bool),
        rb_step=jnp.full(B, -1, jnp.int32),
        rb_pos=jnp.asarray(0, jnp.int32),
    )


def _make_vo_step_fns(params: VoJitParams = VoJitParams()):
    """Build (jitted step, raw traceable step) for ``(state, image) -> ...``."""
    p = params
    K_feat = p.orb.max_features
    M = p.map_capacity

    def reprojection_sq_threshold(focal):
        thr = p.pnp_reproj_px / focal
        return thr * thr

    # ---- shared per-frame preprocessing -----------------------------------
    def preprocess(image, K_inv, focal):
        feats = orb_detect(image, p.orb)
        ones = jnp.ones_like(feats.xy[..., :1])
        xyh = jnp.concatenate([feats.xy, ones], axis=-1)
        rays = xyh @ K_inv.T
        smooth = klt.smooth_image(image)
        tmpl = klt.extract_templates(smooth, feats.xy)
        sigma = feats.sigma / focal
        return _FrameArrays(feats.xy, feats.desc, feats.mask, rays,
                            sigma, tmpl), smooth

    # ---- mode 0: first frame ---------------------------------------------
    def do_empty(state, f, smooth, K_inv, focal):
        new_state = _ring_push(_store_frame(state, f), f)._replace(
            mode=jnp.asarray(MODE_INITIALIZING, jnp.int32)
        )
        out = VoStepOut(
            success=jnp.asarray(False),
            mode=new_state.mode,
            pose_R=state.pose_R, pose_t=state.pose_t,
            num_inliers=jnp.asarray(0, jnp.int32),
            mean_error=jnp.asarray(jnp.inf, state.pose_t.dtype),
            pnp_t=jnp.zeros(3, state.pose_t.dtype),
            init_tried=jnp.asarray(0, jnp.int32),
        )
        return new_state, out

    # ---- mode 1: bootstrap vs the frame-ring window -----------------------
    def do_init(state, f, smooth, K_inv, focal):
        """Two-view bootstrap against ALL ring frames at once (vmapped),
        accepting the oldest (longest-baseline) slot that passes the
        quality gates — the reference's 10-frame initialization queue
        semantics (``visual-odometer.cpp:273-346``) as one batched solve
        instead of a sequential pair scan."""
        dtype = state.pose_t.dtype
        B = p.init_window
        key, k1 = jax.random.split(state.key)
        keys = jax.random.split(k1, B)
        thr_sq = p.max_error_sq / (focal * focal)
        # the RANSAC threshold is focal-scaled and ``focal`` is traced, so
        # call the solver pieces directly instead of the static SfmParams
        from mvslam_tpu.ops import epipolar
        from mvslam_tpu.ops import ransac as ransac_mod

        def try_slot(rb_xy, rb_desc, rb_mask, rb_rays, rb_sigma, rb_tmpl, kb):
            """Cheap per-slot candidate: match + KLT + RANSAC + pose
            recovery + the PRE-refine quality gates. The expensive LM
            refine runs ONCE, after slot selection, not vmapped x B."""
            m = matching.match_features(
                rb_desc, rb_mask, f.desc, f.mask,
                max_distance=p.max_match_distance,
            )
            if p.use_klt:
                kr = klt.klt_track(rb_tmpl, smooth, f.xy[m.idx], m.mask)
                xy2 = kr.xy
                # on KLT failure the observation is the matched NEW-frame
                # feature position, so the fallback sigma is that feature's
                obs_sigma = jnp.where(
                    kr.valid, p.klt_sigma_px / focal, f.sigma[m.idx]
                )
                klt_valid = kr.valid
            else:
                xy2 = f.xy[m.idx]
                obs_sigma = f.sigma[m.idx]     # already focal-normalized
                klt_valid = m.mask
            ones = jnp.ones_like(xy2[..., :1])
            r2 = jnp.concatenate([xy2, ones], axis=-1) @ K_inv.T
            rr = ransac_mod.essential_ransac(
                rb_rays, r2, m.mask, kb,
                num_hypotheses=p.ransac_hypotheses,
                threshold_sq=thr_sq,
            )
            pose2in1, points, point_mask = sfm.recover_pose_and_points(
                rr.model, rb_rays, r2, rr.inlier_mask
            )
            w_rot = jnp.max(jnp.abs(pose2in1.log()[3:]))
            t_norm = jnp.maximum(jnp.linalg.norm(pose2in1.t), 1e-9)
            tz = jnp.abs(pose2in1.t[2]) / t_norm
            n_inl = rr.num_inliers
            # pre-refine gates: inlier count, rotation, z-translation
            # (reference check_image_pair, visual-odometer.cpp:348-382;
            # its error gate needs the refined pair and is applied after
            # the post-selection refine below)
            ok = (
                (n_inl >= p.min_pair_inliers)
                & (w_rot <= p.max_pair_rotation)
                & (tz <= p.max_pair_z_translation)
                & jnp.all(jnp.isfinite(pose2in1.t))
            )
            return dict(
                ok=ok, R=pose2in1.R.astype(dtype), t=pose2in1.t.astype(dtype),
                inlier_mask=rr.inlier_mask, m_idx=m.idx.astype(jnp.int32),
                r2=r2.astype(dtype), obs_sigma=obs_sigma.astype(dtype),
                klt_valid=klt_valid, n_inl=n_inl,
            )

        cand = jax.vmap(try_slot)(
            state.rb_xy, state.rb_desc, state.rb_mask, state.rb_rays,
            state.rb_sigma, state.rb_tmpl, keys,
        )
        ok_b = cand["ok"] & state.rb_valid
        age = state.step - state.rb_step
        score = jnp.where(ok_b, age, -1)
        # slots ranked oldest-passing first (failing slots sort last)
        order = jnp.argsort(-score).astype(jnp.int32)
        n_ok = jnp.sum(ok_b).astype(jnp.int32)

        def refine_slot(b):
            """ONE Sampson polish + LM refine of ring slot ``b``; returns
            (passed_error_gate, enriched selection dict)."""
            s = jax.tree_util.tree_map(lambda x: x[b], cand)
            rb_rays_b = state.rb_rays[b]
            rb_sigma_b = state.rb_sigma[b]
            pose2in1 = SE3(s["R"], s["t"])
            r2 = s["r2"]
            inl = s["inlier_mask"]
            pose2in1 = epipolar.refine_relative_pose_sampson(
                pose2in1, rb_rays_b, r2, inl.astype(dtype)
            )
            points, point_mask = sfm.sfm_triangulate(
                rb_rays_b, r2, inl, pose2in1
            )
            # base-frame observations are template centers — exact by
            # construction (the triangulated point is the scene point imaged
            # there); new-frame observations carry the tracker's noise
            obs_sigma = s["obs_sigma"]
            if p.use_klt:
                sigma1 = jnp.full_like(obs_sigma, p.template_sigma_px / focal)
                sigma1 = jnp.where(s["klt_valid"], sigma1, rb_sigma_b)
            else:
                sigma1 = rb_sigma_b
            ref = sfm.sfm_refine(
                rb_rays_b, r2, point_mask, pose2in1, points,
                obs_stddev=jnp.stack([sigma1, obs_sigma]), gauge="scale_only",
                ba_params=ba_mod.BAParams(max_iterations=p.ba_iterations,
                                          compute_covariance=False,
                                          compute_point_info=True,
                                          huber_delta=p.huber_delta),
            )
            n_obs = jnp.maximum(2 * jnp.sum(point_mask), 1)
            mean_err = 2.0 * ref.error / n_obs.astype(dtype)
            T = ref.pose2in1
            # error gate needs the refined pair (reference check_image_pair,
            # visual-odometer.cpp:348-382; it does NOT gate on LM
            # convergence — gtsam LM runs to its cap too). The gate value is
            # the traced state scalar so tuning it never recompiles.
            passed = (
                (mean_err <= state.gate_pair_err.astype(dtype))
                & jnp.all(jnp.isfinite(T.t))
            )
            return passed, dict(
                s,
                R=T.R.astype(dtype), t=T.t.astype(dtype),
                points=ref.points.astype(dtype),
                point_info=ref.point_information.astype(dtype),
                point_mask=point_mask,
                mean_err=mean_err.astype(dtype),
            )

        # Walk the ranked slots until one passes the refined-error gate —
        # the reference's pair scan falls back to a younger pair when the
        # longest-baseline one fails ANY gate (visual-odometer.cpp:273-346),
        # so a degenerate oldest slot must not sink the whole frame.
        # Typical trip count is 1; the LM refine runs once per attempt.
        K_pts = cand["r2"].shape[1]
        sel0 = jax.tree_util.tree_map(
            lambda x: x[order[0]], cand
        )
        sel0 = dict(
            sel0,
            points=jnp.zeros((K_pts, 3), dtype),
            point_info=jnp.zeros((K_pts, 3, 3), dtype),
            point_mask=jnp.zeros(K_pts, bool),
            mean_err=jnp.asarray(jnp.inf, dtype),
        )

        def w_cond(carry):
            i, passed, _, _ = carry
            return jnp.logical_not(passed) & (i < n_ok)

        def w_body(carry):
            i, _, _, _ = carry
            b = order[i]
            passed, s = refine_slot(b)
            return i + 1, passed, b, s

        n_tried, any_ok, b, sel = jax.lax.while_loop(
            w_cond, w_body, (jnp.asarray(0, jnp.int32),
                             jnp.asarray(False), order[0], sel0)
        )

        def accept(_):
            point_mask = sel["point_mask"]
            # seed map: slot i <- base feature i (masked); base frame = the
            # selected ring frame, which becomes the world frame
            slots = jnp.arange(K_feat, dtype=jnp.int32)
            map_pos = jnp.zeros((M, 3), dtype).at[slots].set(sel["points"])
            map_desc = jnp.zeros((M, 8), jnp.uint32).at[slots].set(
                state.rb_desc[b]
            )
            map_tmpl = jnp.zeros((M,) + state.rb_tmpl.shape[2:], dtype).at[
                slots
            ].set(state.rb_tmpl[b])
            map_valid = jnp.zeros(M, bool).at[slots].set(point_mask)
            map_seen = jnp.full(M, -1, jnp.int32).at[slots].set(
                jnp.where(point_mask, state.step, -1)
            )
            map_info = jnp.zeros((M, 3, 3), dtype).at[slots].set(
                jnp.where(point_mask[:, None, None], sel["point_info"], 0.0)
            )
            # association for the NEW frame: feature m_idx[i] -> slot i
            write_to = jnp.where(point_mask, sel["m_idx"], K_feat)
            assoc = jnp.full(K_feat, -1, jnp.int32).at[write_to].set(
                jnp.where(point_mask, slots, -1), mode="drop"
            )
            obs_rays = jnp.zeros((K_feat, 3), dtype).at[write_to].set(
                sel["r2"], mode="drop"
            )
            obs_rays = jnp.where((assoc >= 0)[:, None], obs_rays, f.rays)
            obs_sig = jnp.full((K_feat,), 1.0, dtype).at[write_to].set(
                sel["obs_sigma"], mode="drop"
            )
            obs_sig = jnp.where(assoc >= 0, obs_sig, f.sigma)
            ns = _store_frame(
                state, f, obs_rays=obs_rays, obs_sigma=obs_sig, assoc=assoc
            )._replace(
                mode=jnp.asarray(MODE_TRACKING, jnp.int32),
                pose_R=sel["R"], pose_t=sel["t"],
                map_pos=map_pos, map_desc=map_desc, map_tmpl=map_tmpl,
                map_valid=map_valid, map_seen=map_seen, map_info=map_info,
                frame_tracked=state.frame_tracked + 1,
            )
            return _ring_clear(ns)

        def reject(_):
            # slide the window: the new frame joins the ring
            return _ring_push(_store_frame(state, f), f)

        new_state = jax.lax.cond(any_ok, accept, reject, None)
        new_state = new_state._replace(key=key)
        out = VoStepOut(
            success=any_ok, mode=new_state.mode,
            pose_R=new_state.pose_R, pose_t=new_state.pose_t,
            num_inliers=sel["n_inl"], mean_error=sel["mean_err"],
            pnp_t=sel["t"], init_tried=n_tried,
        )
        return new_state, out

    # ---- mode 2: tracking --------------------------------------------------
    def do_track(state, f, smooth, K_inv, focal):
        dtype = state.pose_t.dtype
        key, k1 = jax.random.split(state.key)
        # 1) associate to map + KLT against map templates
        m = matching.match_features(
            f.desc, f.mask, state.map_desc, state.map_valid,
            max_distance=p.max_match_distance,
        )
        if p.use_klt:
            kr = klt.klt_track(state.map_tmpl[m.idx], smooth, f.xy, m.mask)
            obs_xy = kr.xy
            obs_sigma = jnp.where(kr.valid, p.klt_sigma_px / focal, f.sigma)
        else:
            obs_xy = f.xy
            obs_sigma = f.sigma
        ones = jnp.ones_like(obs_xy[..., :1])
        obs_rays = jnp.concatenate([obs_xy, ones], axis=-1) @ K_inv.T
        map_pts = state.map_pos[m.idx]
        # 2) P3P-RANSAC (core fn: the reprojection threshold is focal-scaled
        #    and focal is traced, so the static PnpParams wrapper doesn't fit)
        thr_sq = reprojection_sq_threshold(focal)
        pose0, best_inl = pnp.pnp_ransac_core(
            map_pts, obs_rays, m.mask, k1, p.pnp_hypotheses, thr_sq
        )
        n_inl = jnp.sum(best_inl).astype(jnp.int32)

        # 3) triangulate new points vs previous frame
        lm = matching.match_features(
            state.lf_desc, state.lf_mask, f.desc, f.mask,
            max_distance=p.max_match_distance,
        )
        new_assoc_of_new_feat = jnp.full(K_feat, -1, jnp.int32).at[
            jnp.where(m.mask, jnp.arange(K_feat, dtype=jnp.int32), K_feat)
        ].set(m.idx.astype(jnp.int32), mode="drop")
        lm_ok = lm.mask & (new_assoc_of_new_feat[lm.idx] < 0)
        if p.use_klt:
            kr2 = klt.klt_track(state.lf_tmpl, smooth, f.xy[lm.idx], lm_ok)
            xy_new = kr2.xy
            sig_new = jnp.where(kr2.valid, p.klt_sigma_px / focal,
                                f.sigma[lm.idx])
        else:
            xy_new = f.xy[lm.idx]
            sig_new = f.sigma[lm.idx]
        r_new = jnp.concatenate(
            [xy_new, jnp.ones_like(xy_new[..., :1])], axis=-1
        ) @ K_inv.T
        last_pose = SE3(state.pose_R, state.pose_t)
        rel = last_pose.inverse().compose(pose0)
        pts_last, tri_mask = sfm.sfm_triangulate(
            state.lf_rays, r_new, lm_ok, rel
        )
        # consistency gate on fresh triangulations: the point must
        # reproject onto BOTH rays within the tracking threshold. Rays
        # from inconsistent 3D (occlusion boundaries, depth switches,
        # mismatches) triangulate to a compromise point with large
        # residuals; letting it into the BA under the template-anchor
        # weight blows the mean error and trips the reset gate. Reference
        # analog: new points are registered from PnP-inlier matches only
        # (visual-odometer.cpp:417-445).
        e_last = pnp.reprojection_error_sq(
            SE3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype)),
            pts_last, state.lf_rays,
        )
        e_new = pnp.reprojection_error_sq(rel, pts_last, r_new)
        tri_thr = (p.tri_consistency_px / focal) ** 2
        tri_mask = tri_mask & (e_last < tri_thr) & (e_new < tri_thr)
        pts_world = last_pose.apply(pts_last)

        # 4) two-frame BA with fixed capacities; fresh triangulations are
        # RANKED by their two-ray consistency residual (best ba_new enter
        # the BA) rather than taken in feature order — the first-N take
        # made the point mix, and with it the scale, sensitive to how the
        # gate interacted with feature ordering
        old_idx, old_ok = _masked_take(m.mask & best_inl, p.ba_old)
        tri_score = jnp.where(tri_mask, e_last + e_new,
                              jnp.asarray(jnp.inf, dtype))
        new_idx = jnp.argsort(tri_score)[: p.ba_new].astype(jnp.int32)
        new_ok = tri_mask[new_idx]
        obs_slots = m.idx[old_idx]                       # map slots
        # last-frame observation of those slots (reverse assoc)
        lf_map_to_feat = jnp.full(M, -1, jnp.int32).at[
            jnp.where(state.lf_assoc >= 0, state.lf_assoc, M)
        ].set(jnp.arange(K_feat, dtype=jnp.int32), mode="drop")
        lf_feat = lf_map_to_feat[obs_slots]
        lf_seen = (lf_feat >= 0) & old_ok
        cap = p.ba_old + p.ba_new
        pts0 = jnp.zeros((cap, 3), dtype)
        pts0 = pts0.at[: p.ba_old].set(state.map_pos[obs_slots])
        pts0 = pts0.at[p.ba_old :].set(pts_world[new_idx])
        obs = jnp.zeros((2, cap, 2), dtype)
        obs_mask_ba = jnp.zeros((2, cap), bool)
        weight = jnp.ones((2, cap), dtype)
        # old: new-frame obs
        obs = obs.at[1, : p.ba_old].set(obs_rays[old_idx, :2])
        obs_mask_ba = obs_mask_ba.at[1, : p.ba_old].set(old_ok)
        weight = weight.at[1, : p.ba_old].set(1.0 / obs_sigma[old_idx])
        # old: last-frame obs
        safe_lf = jnp.where(lf_feat >= 0, lf_feat, 0)
        obs = obs.at[0, : p.ba_old].set(state.lf_obs_rays[safe_lf, :2])
        obs_mask_ba = obs_mask_ba.at[0, : p.ba_old].set(lf_seen)
        weight = weight.at[0, : p.ba_old].set(
            1.0 / state.lf_obs_sigma[safe_lf]
        )
        # new points: both frames
        nf = lm.idx[new_idx]                             # new-frame feature
        obs = obs.at[0, p.ba_old :].set(state.lf_rays[new_idx, :2])
        obs = obs.at[1, p.ba_old :].set(r_new[new_idx, :2])
        obs_mask_ba = obs_mask_ba.at[0, p.ba_old :].set(new_ok)
        obs_mask_ba = obs_mask_ba.at[1, p.ba_old :].set(new_ok)
        # last-frame obs of new points = template centers (exact by
        # construction, see template_sigma_px)
        weight = weight.at[0, p.ba_old :].set(focal / p.template_sigma_px)
        weight = weight.at[1, p.ba_old :].set(1.0 / sig_new[new_idx])

        point_info = jnp.zeros((cap, 3, 3), dtype)
        # old points carry their recursive landmark information (Hpp from
        # every BA that observed them): large across-ray, small along-ray,
        # so later baselines can re-resolve depth (the isotropic prior the
        # reference uses locks bootstrap depth error in; see sigma=1e-2
        # regulators, sfm-refine.cpp:11-18)
        stored_info = state.map_info[obs_slots]
        has_info = jnp.trace(stored_info, axis1=-2, axis2=-1) > 0
        iso = jnp.eye(3, dtype=dtype) / (p.map_point_stddev**2)
        old_info = jnp.where(has_info[:, None, None], stored_info, iso)
        point_info = point_info.at[: p.ba_old].set(
            jnp.where(old_ok[:, None, None], old_info, 0.0)
        )
        poses0 = SE3(
            jnp.stack([state.pose_R, pose0.R.astype(dtype)]),
            jnp.stack([state.pose_t, pose0.t.astype(dtype)]),
        )
        pose_prior_info = jnp.stack(
            [1e10 * jnp.eye(6, dtype=dtype), jnp.zeros((6, 6), dtype)]
        )
        prob = ba_mod.BAProblem.create(
            poses0=poses0, points0=pts0,
            obs=obs, obs_mask=obs_mask_ba, obs_weight=weight,
            pose_prior=poses0, pose_prior_info=pose_prior_info,
            point_prior=pts0, point_prior_info=point_info,
        )
        result = ba_mod.ba_solve(
            prob, ba_mod.BAParams(max_iterations=p.ba_iterations,
                                  compute_covariance=False,
                                  compute_point_info=True,
                                  huber_delta=p.huber_delta)
        )
        n_obs = jnp.maximum(jnp.sum(obs_mask_ba), 1)
        mean_err = 2.0 * result.error / n_obs.astype(dtype)
        pose = SE3(result.poses.R[1], result.poses.t[1])
        ok = (
            (n_inl >= p.min_track_inliers)
            & (mean_err <= p.max_track_mean_error)
            & jnp.all(jnp.isfinite(pose.t))
        )

        def commit(_):
            pts_ref = result.points.astype(dtype)
            info_ref = result.point_information.astype(dtype)
            w_old = jnp.where(old_ok, obs_slots, M)
            map_pos = state.map_pos.at[w_old].set(
                pts_ref[: p.ba_old], mode="drop")
            map_info = state.map_info.at[w_old].set(
                info_ref[: p.ba_old], mode="drop")
            map_seen = state.map_seen.at[w_old].set(
                state.step, mode="drop")
            # allocate new slots
            slots_new = _allocate_slots(state.map_valid, map_seen, p.ba_new)
            w_new = jnp.where(new_ok, slots_new, M)
            map_pos = map_pos.at[w_new].set(
                pts_ref[p.ba_old :], mode="drop"
            )
            map_desc = state.map_desc.at[w_new].set(
                f.desc[nf], mode="drop"
            )
            map_tmpl = state.map_tmpl.at[w_new].set(
                state.lf_tmpl[new_idx], mode="drop"
            )
            map_valid = state.map_valid.at[w_new].set(True, mode="drop")
            map_seen = map_seen.at[w_new].set(state.step, mode="drop")
            map_info = map_info.at[w_new].set(
                info_ref[p.ba_old :], mode="drop")
            # new-frame association + refined observations
            assoc = jnp.full(K_feat, -1, jnp.int32)
            w_oldfeat = jnp.where(old_ok, old_idx, K_feat)
            assoc = assoc.at[w_oldfeat].set(
                obs_slots.astype(jnp.int32), mode="drop"
            )
            w_nf = jnp.where(new_ok, nf, K_feat)
            assoc = assoc.at[w_nf].set(
                slots_new.astype(jnp.int32), mode="drop"
            )
            o_rays = f.rays.at[w_oldfeat].set(
                obs_rays[old_idx], mode="drop"
            )
            o_rays = o_rays.at[w_nf].set(r_new[new_idx], mode="drop")
            o_sig = f.sigma.at[w_oldfeat].set(
                obs_sigma[old_idx], mode="drop"
            )
            o_sig = o_sig.at[w_nf].set(sig_new[new_idx], mode="drop")
            return _store_frame(
                state, f, obs_rays=o_rays, obs_sigma=o_sig, assoc=assoc
            )._replace(
                pose_R=pose.R.astype(dtype), pose_t=pose.t.astype(dtype),
                map_pos=map_pos, map_desc=map_desc, map_tmpl=map_tmpl,
                map_valid=map_valid, map_seen=map_seen, map_info=map_info,
                frame_tracked=state.frame_tracked + 1,
            )

        def reset(_):
            # back to INITIALIZING keeping the new frame (reference reset)
            M_ = state.map_valid.shape[0]
            ns = _store_frame(state, f)._replace(
                mode=jnp.asarray(MODE_INITIALIZING, jnp.int32),
                map_valid=jnp.zeros(M_, bool),
                map_seen=jnp.full(M_, -1, jnp.int32),
                map_info=jnp.zeros_like(state.map_info),
            )
            return _ring_push(_ring_clear(ns), f)

        new_state = jax.lax.cond(ok, commit, reset, None)
        new_state = new_state._replace(key=key)
        out = VoStepOut(
            success=ok, mode=new_state.mode,
            pose_R=new_state.pose_R, pose_t=new_state.pose_t,
            num_inliers=n_inl, mean_error=mean_err.astype(dtype),
            pnp_t=pose0.t.astype(dtype),
            init_tried=jnp.asarray(0, jnp.int32),
        )
        return new_state, out

    def combine_fn(state: VoJitState, f: _FrameArrays, smooth: Array,
                   K_inv: Array, focal: Array):
        state = state._replace(
            step=state.step + 1, frame_total=state.frame_total + 1
        )
        new_state, out = jax.lax.switch(
            state.mode,
            [
                lambda s: do_empty(s, f, smooth, K_inv, focal),
                lambda s: do_init(s, f, smooth, K_inv, focal),
                lambda s: do_track(s, f, smooth, K_inv, focal),
            ],
            state,
        )
        return new_state, out

    def step_fn(state: VoJitState, image: Array, K_inv: Array, focal: Array):
        f, smooth = preprocess(image, K_inv, focal)
        return combine_fn(state, f, smooth, K_inv, focal)

    return jax.jit(step_fn), step_fn, preprocess, combine_fn


def make_vo_step(params: VoJitParams = VoJitParams()):
    """Build the jitted ``step(state, image, K_inv, focal)``."""
    jitted, _, _, _ = _make_vo_step_fns(params)
    return jitted


def make_vo_pipelined(params: VoJitParams = VoJitParams()):
    """Build ``(pre, combine)`` — the fused step split at its only
    state-independent seam (pipeline-parallel row, SURVEY §2.8).

    ``pre(image, K_inv, focal) -> (frame_arrays, smooth)`` is the whole
    per-frame feature pipeline (ORB pyramid, rays, smoothing, templates);
    ``combine(state, frame_arrays, smooth, K_inv, focal) -> (state, out)``
    is the state machine (bootstrap / PnP / BA / map update).

    The online driver overlaps frame ``t+1``'s host decode + ``pre``
    dispatch with frame ``t``'s in-flight ``combine`` (jax async dispatch
    does the double-buffering; no explicit streams needed):

        nxt = pre(decode(0), ...)
        for t in range(T):
            cur, nxt = nxt, (pre(decode(t+1), ...) if t+1 < T else None)
            state, out = combine(state, *cur, ...)   # device: pre(t+1) ∥ host
    """
    _, _, preprocess, combine_fn = _make_vo_step_fns(params)
    return jax.jit(preprocess), jax.jit(combine_fn)


def make_vo_replay(params: VoJitParams = VoJitParams()):
    """Build ``replay(state, images, K_inv, focal) -> (state, outs)``.

    Scans the per-frame step over a stacked ``(T, H, W)`` image batch in ONE
    device dispatch — the compiler-friendly dataset-replay path (the
    reference's per-frame mutex loop, ``utility/visual-odometer.cpp:78-116``,
    becomes a ``lax.scan``). Outputs are stacked :class:`VoStepOut` leaves.
    """
    _, step_fn, _, _ = _make_vo_step_fns(params)

    @jax.jit
    def replay(state: VoJitState, images: Array, K_inv: Array, focal: Array):
        def body(s, img):
            return step_fn(s, img, K_inv, focal)

        return jax.lax.scan(body, state, images)

    return replay
