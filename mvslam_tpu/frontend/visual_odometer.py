"""VisualOdometer: the tracking state machine (the core runtime).

Rebuild of ``front-end/visual-odometer.{hpp,cpp}`` (1000 LoC, the reference's
biggest component). States INITIALIZING / TRACKING
(``visual-odometer.hpp:89-93``); per frame:

- INITIALIZING (``initialize``, ``visual-odometer.cpp:273-346``): keep a
  sliding window of frames; try two-view bootstrap of the newest frame
  against the queued frames, longest baseline first; accept the first pair
  passing the quality gates (``check_image_pair``, ``:348-382``: valid,
  enough inliers, small refined error, bounded rotation and out-of-plane
  translation); seed the map from its refined points.
- TRACKING (``track``, ``:384-500``): associate the new frame's features to
  the map (descriptor matching), P3P/PnP-RANSAC the camera pose
  (``track_pnp``, ``:502-615``), triangulate newly observed points against
  the previous frame, then a two-frame bundle adjustment with the previous
  frame anchored (``track_refine``, ``:617-805``); accept on small error or
  ``reset()`` back to INITIALIZING (the self-healing re-bootstrap,
  ``:203-217``).

Design deltas from the reference (all improvements, documented here on
purpose):

- **Map-based association**: the reference chains feature indices
  frame-to-frame and recovers scale per-step from the translation norm
  (``:579-589``) because each two-view solve is unit-scale. Here the map
  lives in world coordinates with per-point descriptors; PnP against the
  map returns a metrically consistent pose directly, so there is no scale
  ratio hack — the world scale is set once by the bootstrap baseline.
- **Statistically correct weights**: measurement sigmas are in ideal-camera
  units (pixel sigma / focal); acceptance gates use the *mean standardized*
  squared residual (scale-free) rather than the reference's raw cost-sum
  thresholds.
- Host orchestrates; every numerical step (matching, RANSAC, triangulation,
  BA) is a statically-shaped jitted kernel from ``mvslam_tpu.ops``.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.frontend.data_types import Frame
from mvslam_tpu.frontend.image_pair import KLT_SIGMA_PX, ImagePair, ImagePairParams, PairState
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import klt, matching, pnp, sfm


class VoState(enum.Enum):
    INITIALIZING = 0
    TRACKING = 1


class VoParams(NamedTuple):
    frame_queue_size: int = 10              # reference default (vo.cpp:71-72)
    # bootstrap gates (reference check_image_pair, vo.cpp:348-382)
    min_pair_inliers: int = 20
    max_pair_mean_error: float = 4.0        # mean standardized sq residual
    max_pair_rotation: float = 0.1          # rad
    max_pair_z_translation: float = 0.1     # |t_z| of the unit baseline
    # tracking gates
    min_track_inliers: int = 7              # reference PNP_POINT_MIN
    pnp_reproj_px: float = 2.0              # PnP inlier gate, pixels
    max_track_mean_error: float = 9.0
    max_map_points: int = 1024
    ba_capacity: int = 512                  # points per track_refine solve
    map_point_stddev: float = 0.05          # regulator sigma on map points
    pair: ImagePairParams = ImagePairParams()
    pnp: pnp.PnpParams = pnp.PnpParams()
    ba: ba_mod.BAParams = ba_mod.BAParams(max_iterations=25)


@dataclass
class _Map:
    """Fixed-capacity world map: positions, descriptors, KLT templates.

    Each point carries the image template of its *first* observation, so
    every later observation is refined against the same photometric anchor
    — track-lifetime-consistent sub-pixel measurements (no frame-to-frame
    error accumulation in the observations themselves).
    """

    capacity: int
    positions: np.ndarray = field(init=False)     # (M, 3) float32
    desc: np.ndarray = field(init=False)          # (M, 8) uint32
    templates: np.ndarray = field(init=False)     # (M, W, W) float32
    valid: np.ndarray = field(init=False)         # (M,) bool
    last_seen: np.ndarray = field(init=False)     # (M,) int64

    def __post_init__(self):
        self.positions = np.zeros((self.capacity, 3), np.float32)
        self.desc = np.zeros((self.capacity, 8), np.uint32)
        self.templates = np.zeros(
            (self.capacity, klt.WINDOW, klt.WINDOW), np.float32
        )
        self.valid = np.zeros(self.capacity, bool)
        self.last_seen = np.full(self.capacity, -1, np.int64)

    def clear(self):
        self.valid[:] = False
        self.last_seen[:] = -1

    def count(self) -> int:
        return int(self.valid.sum())

    def allocate(self, n: int, now: int) -> np.ndarray:
        """Indices of n slots: free ones first, then least-recently-seen."""
        free = np.flatnonzero(~self.valid)
        if len(free) >= n:
            return free[:n]
        order = np.argsort(self.last_seen)      # stale first
        extra = [i for i in order if self.valid[i]][: n - len(free)]
        return np.concatenate([free, np.asarray(extra, np.int64)])


class TrackResult(NamedTuple):
    success: bool
    pose: Optional[SE3]               # camera pose in the init frame
    num_inliers: int
    mean_error: float
    reason: str


class VisualOdometer:
    """Reference API surface: ``add_frame`` -> tracked/not, pose getters,
    tracked points, ``reset`` (``visual-odometer.hpp:13-183``)."""

    def __init__(self, params: VoParams = VoParams(),
                 T_camera_to_body: SE3 | None = None) -> None:
        self.params = params
        self.state = VoState.INITIALIZING
        self._frames: List[Frame] = []            # sliding init window
        self._map = _Map(params.max_map_points)
        self._last_frame: Optional[Frame] = None
        self._last_pose: Optional[SE3] = None     # camera-in-init-frame
        self._last_assoc: Optional[np.ndarray] = None  # (K,) feat -> map idx
        self._last_obs_rays: Optional[np.ndarray] = None   # (K, 3) refined
        self._last_obs_sigma: Optional[np.ndarray] = None  # (K,)
        self._last_templates: Optional[np.ndarray] = None  # (K, W, W)
        self._T_cam_body = T_camera_to_body
        self._step = 0
        self.frame_total = 0
        self.frame_tracked = 0
        #: [(frame_id, capture_time, SE3 camera pose)] of successful frames
        self.trajectory: List[tuple] = []

    # -- public API -----------------------------------------------------------
    def add_frame(self, frame: Frame) -> TrackResult:
        self.frame_total += 1
        self._step += 1
        if self.state == VoState.INITIALIZING:
            res = self._initialize(frame)
        else:
            res = self._track(frame)
            if not res.success:
                self.reset(keep_frame=frame)
        if res.success:
            self.frame_tracked += 1
            self.trajectory.append(
                (frame.id, frame.capture_time, self._last_pose)
            )
        return res

    def reset(self, keep_frame: Optional[Frame] = None) -> None:
        """Back to INITIALIZING keeping only the newest frame (reference
        ``reset``, ``visual-odometer.cpp:203-217``)."""
        self.state = VoState.INITIALIZING
        self._frames = [keep_frame] if keep_frame is not None else []
        self._map.clear()
        self._last_frame = None
        self._last_pose = None
        self._last_assoc = None
        self._last_obs_rays = None
        self._last_obs_sigma = None
        self._last_templates = None

    def get_camera_pose(self) -> Optional[SE3]:
        return self._last_pose

    def get_body_pose(self) -> Optional[SE3]:
        """Body pose via camera-extrinsics conjugation (reference
        ``get_body_pose``, ``visual-odometer.cpp:225-244``)."""
        if self._last_pose is None:
            return None
        if self._T_cam_body is None:
            return self._last_pose
        return self._last_pose.compose(self._T_cam_body)

    def get_tracked_points(self) -> np.ndarray:
        return self.positions_of(self._map.valid)

    def positions_of(self, mask: np.ndarray) -> np.ndarray:
        return self._map.positions[mask]

    @property
    def num_tracked_points(self) -> int:
        return self._map.count()

    # -- initialization -------------------------------------------------------
    def _initialize(self, frame: Frame) -> TrackResult:
        self._frames.append(frame)
        if len(self._frames) > self.params.frame_queue_size:
            self._frames.pop(0)
        if len(self._frames) < 2:
            return TrackResult(False, None, 0, float("inf"), "need frames")
        # longest baseline first (reference initialize, vo.cpp:273-346)
        for base in self._frames[:-1]:
            pair = ImagePair(base, frame, self.params.pair, seed=self._step)
            if pair.state == PairState.INIT:
                continue
            pair.refine()
            ok, why = self._check_image_pair(pair)
            if not ok:
                continue
            self._seed_map(pair)
            self.state = VoState.TRACKING
            return TrackResult(
                True, self._last_pose, pair.match_inlier_count,
                pair.mean_error, "bootstrap",
            )
        return TrackResult(False, None, 0, float("inf"), "no valid pair")

    def _check_image_pair(self, pair: ImagePair) -> tuple[bool, str]:
        """Reference quality gates (``check_image_pair``, vo.cpp:348-382)."""
        p = self.params
        if pair.match_inlier_count < p.min_pair_inliers:
            return False, "inliers"
        if pair.mean_error > p.max_pair_mean_error:
            return False, "error"
        T = pair.T_pair_to_base
        w = np.asarray(T.log())[3:]
        if np.abs(w).max() > p.max_pair_rotation:
            return False, "rotation"
        t = np.asarray(T.t)
        if abs(t[2]) / max(np.linalg.norm(t), 1e-9) > p.max_pair_z_translation:
            return False, "z-translation"
        return True, "ok"

    def _seed_map(self, pair: ImagePair) -> None:
        """World frame := the pair's base camera frame; map := refined
        points with base-frame templates; associations + refined pair-frame
        observations carried into tracking."""
        points, _ = pair.points
        pmask = np.asarray(pair.result.point_mask)
        pts = np.asarray(points, np.float32)
        base_feats = pair.base.features
        idxs = np.flatnonzero(pmask)
        n = min(len(idxs), self._map.capacity)
        idxs = idxs[:n]
        self._map.clear()
        slots = np.arange(n)
        self._map.positions[slots] = pts[idxs]
        self._map.desc[slots] = np.asarray(base_feats.desc, np.uint32)[idxs]
        base_templates = np.asarray(
            klt.extract_templates(pair.base.image_smooth, base_feats.xy), np.float32
        )
        self._map.templates[slots] = base_templates[idxs]
        self._map.valid[slots] = True
        self._map.last_seen[slots] = self._step
        # association + refined observations for the PAIR (newest) frame:
        # its feature j = match.idx[i] observed map point from base feat i
        K = pair.pair.features.capacity
        assoc = np.full(K, -1, np.int64)
        obs_rays = np.asarray(pair.pair.rays, np.float64).copy()
        obs_sigma = np.asarray(pair.pair.sigma, np.float64).copy()
        match_idx = np.asarray(pair.match.idx)
        r2 = np.asarray(pair._r2, np.float64)
        s2 = np.asarray(pair.obs_sigma, np.float64)
        for slot, i in zip(slots, idxs):
            j = match_idx[i]
            assoc[j] = slot
            obs_rays[j] = r2[i]
            obs_sigma[j] = s2[i]
        self._last_frame = pair.pair
        self._last_pose = pair.T_pair_to_base
        self._last_assoc = assoc
        self._last_obs_rays = obs_rays
        self._last_obs_sigma = obs_sigma
        self._last_templates = np.asarray(
            klt.extract_templates(pair.pair.image_smooth, pair.pair.features.xy),
            np.float32,
        )
        self._frames = []

    # -- tracking -------------------------------------------------------------
    def _track(self, frame: Frame) -> TrackResult:
        p = self.params
        # 1) associate features to the map by descriptor matching, then
        #    sub-pixel refine every observation against the map point's
        #    first-observation template (track-consistent measurements)
        map_desc = jnp.asarray(self._map.desc)
        map_valid = jnp.asarray(self._map.valid)
        m = matching.match_features(
            frame.features.desc, frame.features.mask, map_desc, map_valid,
            max_distance=p.pair.max_match_distance,
        )
        kr = klt.klt_track(
            jnp.asarray(self._map.templates)[m.idx], frame.image_smooth,
            frame.features.xy, m.mask,
        )
        obs_rays = frame.camera.normalize_points(kr.xy)
        obs_sigma = jnp.where(
            kr.valid, KLT_SIGMA_PX / frame.focal, frame.sigma
        )
        map_pts = jnp.asarray(self._map.positions)[m.idx]
        # 2) PnP against the map (threshold given in pixels, applied in
        #    ideal units — reference passes 0.05 to OpenCV unscaled)
        pnp_params = p.pnp._replace(threshold=p.pnp_reproj_px / frame.focal)
        pr = pnp.pnp_solve(
            map_pts.astype(obs_rays.dtype), obs_rays, m.mask,
            jax.random.PRNGKey(self._step), pnp_params,
        )
        n_inl = int(pr.num_inliers)
        if not bool(pr.success) or n_inl < p.min_track_inliers:
            return TrackResult(False, None, n_inl, float("inf"), "pnp")
        # 3) triangulate newly observed points against the previous frame
        tri = self._triangulate_new(frame, pr.pose, m)
        # 4) two-frame BA: last frame anchored, new frame free, observed map
        #    points regulated, new points free
        result = self._track_refine(frame, pr, m, obs_rays, obs_sigma, tri)
        if result is None:
            return TrackResult(False, None, n_inl, float("inf"), "refine")
        pose, mean_err, commit = result
        if mean_err > p.max_track_mean_error:
            return TrackResult(False, None, n_inl, mean_err, "error gate")
        commit()
        return TrackResult(True, pose, n_inl, mean_err, "tracked")

    def _triangulate_new(self, frame: Frame, pose_new: SE3, m):
        """Find last<->new feature matches without a map point, KLT-refine
        the new-frame end against last-frame templates, and triangulate in
        world coordinates (reference registers new points per tracked
        frame, vo.cpp:417-445)."""
        last = self._last_frame
        lm = matching.match_features(
            last.features.desc, last.features.mask,
            frame.features.desc, frame.features.mask,
            max_distance=self.params.pair.max_match_distance,
        )
        lm_idx = np.asarray(lm.idx)
        lm_ok = np.asarray(lm.mask).copy()
        # drop pairs whose new-frame feature is already associated to the map
        new_assoc = np.full(frame.features.capacity, -1, np.int64)
        m_ok = np.asarray(m.mask)
        m_idx = np.asarray(m.idx)
        new_assoc[m_ok] = m_idx[m_ok]
        lm_ok &= new_assoc[lm_idx] < 0
        kr = klt.klt_track(
            jnp.asarray(self._last_templates), frame.image_smooth,
            frame.features.xy[jnp.asarray(lm_idx)], jnp.asarray(lm_ok),
        )
        r_new = frame.camera.normalize_points(kr.xy)      # aligned to last i
        sig_new = jnp.where(
            kr.valid, KLT_SIGMA_PX / frame.focal,
            frame.sigma[jnp.asarray(lm_idx)],
        )
        rel = self._last_pose.inverse().compose(pose_new)   # new in last frame
        pts_last, pmask = sfm.sfm_triangulate(
            last.rays, r_new, jnp.asarray(lm_ok), rel
        )
        pts_world = self._last_pose.apply(pts_last)
        return dict(
            pts_world=pts_world, mask=np.asarray(pmask), lm_idx=lm_idx,
            r_new=np.asarray(r_new, np.float64),
            sig_new=np.asarray(sig_new, np.float64),
        )

    def _track_refine(self, frame: Frame, pr, m, obs_rays, obs_sigma, tri):
        """Two-frame BA (reference ``track_refine``, vo.cpp:617-805).

        All observations are KLT-refined: new-frame observations of map
        points against the map templates, last-frame observations carried
        over from when the last frame was tracked, and both ends of newly
        triangulated points against the last frame's templates.
        """
        p = self.params
        dtype = frame.rays.dtype
        cap = p.ba_capacity
        K = frame.features.capacity

        m_ok = np.asarray(m.mask) & np.asarray(pr.inlier_mask)
        m_idx = np.asarray(m.idx)
        # --- select observed map points ---
        obs_feats = np.flatnonzero(m_ok)                # new-frame feature ids
        obs_slots = m_idx[obs_feats]                    # map slots
        # last-frame observations of those map points
        last_map_to_feat = np.full(self._map.capacity, -1, np.int64)
        la = self._last_assoc
        has = la >= 0
        last_map_to_feat[la[has]] = np.flatnonzero(has)
        # --- select new points ---
        new_ids = np.flatnonzero(tri["mask"])           # last-frame feature ids
        n_old = min(len(obs_feats), cap)
        n_new = min(len(new_ids), cap - n_old)
        obs_feats = obs_feats[:n_old]
        obs_slots = obs_slots[:n_old]
        new_ids = new_ids[:n_new]

        if n_old < 3:
            return None

        # --- assemble BA problem arrays (capacity cap, masked) ---
        pts0 = np.zeros((cap, 3), np.float64)
        pts0[:n_old] = self._map.positions[obs_slots]
        pts0[n_old : n_old + n_new] = np.asarray(tri["pts_world"])[new_ids]
        obs = np.zeros((2, cap, 2), np.float64)
        obs_mask = np.zeros((2, cap), bool)
        weight = np.ones((2, cap), np.float64)
        last = self._last_frame
        r_new_map = np.asarray(obs_rays, np.float64)    # new-frame obs (KLT)
        s_new_map = np.asarray(obs_sigma, np.float64)
        r_last_obs = self._last_obs_rays
        s_last_obs = self._last_obs_sigma
        # old points: observed by new frame (always) and last frame (if seen)
        obs[1, :n_old] = r_new_map[obs_feats, :2]
        obs_mask[1, :n_old] = True
        weight[1, :n_old] = 1.0 / s_new_map[obs_feats]
        lf = last_map_to_feat[obs_slots]
        seen = lf >= 0
        obs[0, :n_old][seen] = r_last_obs[lf[seen], :2]
        obs_mask[0, :n_old] = seen
        weight[0, :n_old][seen] = 1.0 / s_last_obs[lf[seen]]
        # new points: last-frame end is the template anchor (the feature
        # position itself), new-frame end is the KLT-refined track
        nf = np.asarray(tri["lm_idx"])[new_ids]         # new-frame feature ids
        r_last_feat = np.asarray(last.rays, np.float64)
        sig_anchor = KLT_SIGMA_PX / last.focal
        obs[0, n_old : n_old + n_new] = r_last_feat[new_ids, :2]
        obs[1, n_old : n_old + n_new] = tri["r_new"][new_ids, :2]
        obs_mask[:, n_old : n_old + n_new] = True
        weight[0, n_old : n_old + n_new] = 1.0 / sig_anchor
        weight[1, n_old : n_old + n_new] = 1.0 / tri["sig_new"][new_ids]

        # priors: last pose anchored tight; map points regulated
        anchor_info = 1e10
        point_info = np.zeros((cap, 3, 3), np.float64)
        point_info[:n_old] = np.eye(3) / (p.map_point_stddev**2)
        poses0 = SE3(
            jnp.stack([self._last_pose.R.astype(dtype), pr.pose.R]),
            jnp.stack([self._last_pose.t.astype(dtype), pr.pose.t]),
        )
        pose_prior_info = jnp.stack(
            [
                anchor_info * jnp.eye(6, dtype=dtype),
                jnp.zeros((6, 6), dtype),
            ]
        )
        prob = ba_mod.BAProblem.create(
            poses0=poses0,
            points0=jnp.asarray(pts0, dtype),
            obs=jnp.asarray(obs, dtype),
            obs_mask=jnp.asarray(obs_mask),
            obs_weight=jnp.asarray(weight, dtype),
            pose_prior=poses0,
            pose_prior_info=pose_prior_info,
            point_prior=jnp.asarray(pts0, dtype),
            point_prior_info=jnp.asarray(point_info, dtype),
        )
        result = ba_mod.ba_solve(prob, p.ba)
        n_obs = int(obs_mask.sum())
        mean_err = 2.0 * float(result.error) / max(n_obs, 1)
        pose = SE3(result.poses.R[1], result.poses.t[1])

        def commit():
            pts = np.asarray(result.points, np.float32)
            self._map.positions[obs_slots] = pts[:n_old]
            self._map.last_seen[obs_slots] = self._step
            # add new points: descriptors from the new frame, templates
            # anchored at their first (last-frame) observation
            slots = self._map.allocate(n_new, self._step)[:n_new]
            self._map.positions[slots] = pts[n_old : n_old + n_new]
            self._map.desc[slots] = np.asarray(frame.features.desc, np.uint32)[nf]
            self._map.templates[slots] = self._last_templates[new_ids]
            self._map.valid[slots] = True
            self._map.last_seen[slots] = self._step
            # association + refined observations for the new frame
            assoc = np.full(K, -1, np.int64)
            assoc[obs_feats] = obs_slots
            assoc[nf] = slots
            obs_out = np.asarray(frame.rays, np.float64).copy()
            sig_out = np.asarray(frame.sigma, np.float64).copy()
            obs_out[obs_feats] = r_new_map[obs_feats]
            sig_out[obs_feats] = s_new_map[obs_feats]
            obs_out[nf, :2] = tri["r_new"][new_ids, :2]
            obs_out[nf, 2] = 1.0
            sig_out[nf] = tri["sig_new"][new_ids]
            self._last_frame = frame
            self._last_pose = pose
            self._last_assoc = assoc
            self._last_obs_rays = obs_out
            self._last_obs_sigma = sig_out
            self._last_templates = np.asarray(
                klt.extract_templates(frame.image_smooth, frame.features.xy),
                np.float32,
            )

        return pose, mean_err, commit
