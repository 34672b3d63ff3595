"""reconstruct-scene: two-image SfM demo.

Rebuild of ``utility/reconstruct-scene.cpp:22-81``: extract + match ORB
features from two images, run the two-view solve, print the recovered pose
and point count, and export the scene (PLY) plus a match-overlay PNG instead
of opening viewer windows.

Usage:
    python -m mvslam_tpu.apps.reconstruct_scene IMG1 IMG2 CAMERA_CONFIG
        [--out-dir OUT]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from mvslam_tpu.frontend import FrameManager, ImagePair
from mvslam_tpu.io import load_image_grayscale, save_image
from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.utils.errors import ApplicationErrorCode
from mvslam_tpu.viz import draw_matches, save_scene_ply


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="reconstruct-scene", description=__doc__)
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("camera_config")
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args(argv)

    try:
        cam = PinholeCamera.load_from_file(args.camera_config)
        img1 = load_image_grayscale(args.image1)
        img2 = load_image_grayscale(args.image2)
    except Exception as e:
        print(f"bad input: {e}", file=sys.stderr)
        return ApplicationErrorCode.BAD_IO

    fm = FrameManager(camera=cam)
    f1 = fm.add_frame(0.0, img1)
    f2 = fm.add_frame(0.1, img2)
    pair = ImagePair(f1, f2)
    if pair.result is None or not bool(pair.result.success):
        print("reconstruction failed", file=sys.stderr)
        return ApplicationErrorCode.BAD_DATA
    pair.refine()

    T = pair.T_pair_to_base
    print("pose2in1 translation:", np.asarray(T.t).round(5))
    print("pose2in1 rotation (tangent):", np.asarray(T.log())[3:].round(5))
    print("match inliers:", pair.match_inlier_count,
          "mean error:", round(pair.mean_error, 4))
    points, mask = pair.points
    pts = np.asarray(points)[np.asarray(mask)]
    print("triangulated points:", len(pts))

    os.makedirs(args.out_dir, exist_ok=True)
    ply = os.path.join(args.out_dir, "reconstruction.ply")
    from mvslam_tpu.math.lie import SE3

    save_scene_ply(ply, pts, [SE3.identity(dtype=T.t.dtype), T])
    overlay = draw_matches(
        img1, np.asarray(f1.features.xy), img2, np.asarray(f2.features.xy),
        np.asarray(pair.match.idx), np.asarray(pair.match.mask),
        np.asarray(pair.result.inlier_mask),
    )
    png = os.path.join(args.out_dir, "matches.png")
    save_image(png, overlay)
    print(f"wrote {ply} and {png}")
    return ApplicationErrorCode.NONE


if __name__ == "__main__":
    raise SystemExit(main())
