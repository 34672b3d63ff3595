"""ImagePair: the two-view reconstruction unit with quality metrics.

Rebuild of ``front-end/image-pair.{hpp,cpp}``: a (base frame, pair frame)
couple that matches features, reconstructs relative pose + points
(``reconstruct``, ``image-pair.cpp:115-174``), optionally bundle-adjusts
(``refine``, ``:176-238``), and can be upgraded to a newer pair frame when
that yields at least as many inliers and a lower refined error (``update``,
``:77-113``). State machine INIT -> RECONSTRUCTED -> REFINED
(``image-pair.hpp:75-81``).

Quality metrics exposed for the VO gates: ``match_inlier_count``,
``match_inlier_ssd`` (sum of squared descriptor distances over inliers) and
the refined BA ``error``.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mvslam_tpu.frontend.data_types import Frame
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import klt, matching, sfm

#: effective measurement stddev (px) of a KLT-converged correspondence
KLT_SIGMA_PX = 0.25


class PairState(enum.Enum):
    INIT = 0
    RECONSTRUCTED = 1
    REFINED = 2


class ImagePairParams(NamedTuple):
    max_match_distance: int = 64
    lowe_ratio: float = matching.LOWE_RATIO
    sfm: sfm.SfmParams = sfm.SfmParams()
    gauge: str = "scale_only"
    use_klt: bool = True                 # sub-pixel refine matched positions


class ImagePair:
    """Two-view unit. Frames are immutable; reconstruction is jitted."""

    def __init__(
        self,
        base: Frame,
        pair: Frame,
        params: ImagePairParams = ImagePairParams(),
        seed: int = 0,
        auto_reconstruct: bool = True,
    ) -> None:
        self.base = base
        self.pair = pair
        self.params = params
        self._seed = seed
        self.state = PairState.INIT
        self.match: Optional[matching.MatchResult] = None
        self.result: Optional[sfm.SfmResult] = None
        self.refined: Optional[sfm.SfmRefineResult] = None
        self.match_inlier_count = 0
        self.match_inlier_ssd = float("inf")
        self.error = float("inf")
        self.mean_error = float("inf")
        if auto_reconstruct:
            self.reconstruct()

    # -- stages ---------------------------------------------------------------
    def reconstruct(self) -> bool:
        """Match + two-view solve (reference ``image-pair.cpp:115-174``)."""
        f1, f2 = self.base.features, self.pair.features
        self.match = matching.match_features(
            f1.desc, f1.mask, f2.desc, f2.mask,
            max_distance=self.params.max_match_distance,
            ratio=self.params.lowe_ratio,
        )
        r1 = self.base.rays
        self.obs_sigma = self.base.sigma
        if (
            self.params.use_klt
            and self.base.image is not None
            and self.pair.image is not None
            and self.base.camera is not None
        ):
            # sub-pixel refine the pair-frame positions against base
            # templates; drop effective noise to ~KLT_SIGMA_PX
            tmpl = klt.extract_templates(self.base.image_smooth, f1.xy)
            kr = klt.klt_track(
                tmpl, self.pair.image_smooth, f2.xy[self.match.idx], self.match.mask
            )
            r2 = self.base.camera.normalize_points(kr.xy)
            self.obs_sigma = jnp.where(
                kr.valid, KLT_SIGMA_PX / self.base.focal, self.base.sigma
            )
        else:
            r2 = self.pair.rays[self.match.idx]
        self._r2 = r2
        # RANSAC threshold lives in squared *pixel-ish* units in the params
        # (reference MAX_ERROR_SQ = 5e-2); convert to squared ideal-plane
        # units with the focal (reference sfm-solve.cpp:56-60)
        sfm_params = self.params.sfm._replace(
            threshold_sq=self.params.sfm.threshold_sq / (self.base.focal**2)
        )
        self.result = sfm.sfm_solve(
            r1, self._r2, self.match.mask,
            jax.random.PRNGKey(self._seed), sfm_params,
        )
        ok = bool(self.result.success)
        if ok:
            self.state = PairState.RECONSTRUCTED
            self.match_inlier_count = int(self.result.num_inliers)
            inl = self.result.inlier_mask
            d = self.match.dist.astype(jnp.float32)
            self.match_inlier_ssd = float(jnp.sum(jnp.where(inl, d * d, 0.0)))
        return ok

    def refine(self) -> bool:
        """Two-view BA (reference ``image-pair.cpp:176-238``)."""
        if self.state == PairState.INIT:
            return False
        r1 = self.base.rays
        self.refined = sfm.sfm_refine(
            r1, self._r2, self.result.point_mask,
            self.result.pose2in1, self.result.points,
            obs_stddev=self.obs_sigma, gauge=self.params.gauge,
        )
        self.error = float(self.refined.error)
        # scale-free quality: mean squared standardized residual per
        # observation (2 frames observe each masked point)
        n_obs = max(2 * int(jnp.sum(self.result.point_mask)), 1)
        self.mean_error = 2.0 * self.error / n_obs
        self.state = PairState.REFINED
        return bool(self.refined.converged)

    def update(self, new_pair: Frame, seed: int = 0) -> bool:
        """Try swapping in a newer pair frame; keep the swap when it has at
        least as many inliers and a lower refined error (reference
        ``image-pair.cpp:77-113``). Returns True if swapped."""
        candidate = ImagePair(self.base, new_pair, self.params, seed)
        if candidate.state == PairState.INIT:
            return False
        candidate.refine()
        if (
            candidate.match_inlier_count >= self.match_inlier_count
            and candidate.error <= self.error
        ):
            self.__dict__.update(candidate.__dict__)
            return True
        return False

    # -- outputs --------------------------------------------------------------
    @property
    def T_pair_to_base(self) -> Optional[SE3]:
        """Pose of the pair camera in the base frame (unit-scale baseline)."""
        if self.state == PairState.REFINED:
            return self.refined.pose2in1
        if self.state == PairState.RECONSTRUCTED:
            return self.result.pose2in1
        return None

    @property
    def points(self):
        if self.state == PairState.REFINED:
            return self.refined.points, self.result.point_mask
        if self.state == PairState.RECONSTRUCTED:
            return self.result.points, self.result.point_mask
        return None, None
