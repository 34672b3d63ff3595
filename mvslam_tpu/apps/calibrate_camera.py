"""calibrate-camera: chessboard intrinsics calibration over a directory.

Rebuild of ``utility/calibrate-camera.cpp:77-215``. The numerical solve is
our own Zhang's-method implementation (``mvslam_tpu.ops.calibration``:
per-view homographies, absolute-conic intrinsics, joint GN refinement);
chessboard corner *detection* uses OpenCV when available (input tooling, not
the compute path — the reference uses ``cv::findChessboardCorners`` too).
Writes a :class:`PinholeCamera` text file.

Usage:
    python -m mvslam_tpu.apps.calibrate_camera IMAGE_DIR OUT_CONFIG
        [--rows 6] [--cols 9] [--square-size 1.0] [--extension .jpg]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from mvslam_tpu.io import iter_directory, load_image_grayscale
from mvslam_tpu.ops.calibration import calibrate_planar
from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.utils.errors import ApplicationErrorCode


def find_chessboard(img01: np.ndarray, rows: int, cols: int):
    """(N, 2) corner pixels or None. OpenCV-backed detection."""
    try:
        import cv2
    except ImportError:
        print("chessboard detection requires cv2", file=sys.stderr)
        return None
    img8 = (np.asarray(img01) * 255).astype(np.uint8)
    ok, corners = cv2.findChessboardCorners(img8, (cols, rows))
    if not ok:
        return None
    corners = cv2.cornerSubPix(
        img8, corners, (5, 5), (-1, -1),
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3),
    )
    return corners.reshape(-1, 2)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="calibrate-camera", description=__doc__)
    ap.add_argument("image_dir")
    ap.add_argument("out_config")
    ap.add_argument("--rows", type=int, default=6)
    ap.add_argument("--cols", type=int, default=9)
    ap.add_argument("--square-size", type=float, default=1.0)
    ap.add_argument("--extension", default=".jpg")
    ap.add_argument("--distortion", action="store_true",
                    help="estimate radial (k1, k2) jointly (reference "
                         "calibrate-camera.cpp:171-186)")
    ap.add_argument("--undistort-preview", metavar="OUT_PNG", default=None,
                    help="write the first view undistorted with the "
                         "estimated coefficients (implies --distortion; "
                         "reference :208)")
    args = ap.parse_args(argv)
    if args.undistort_preview:
        args.distortion = True

    import jax.numpy as jnp

    views = []
    for path in iter_directory(args.image_dir, args.extension):
        img = load_image_grayscale(path)
        corners = find_chessboard(np.asarray(img), args.rows, args.cols)
        if corners is None:
            print(f"no chessboard in {path}", file=sys.stderr)
            continue
        views.append(corners)
        print(f"{path}: {len(corners)} corners", file=sys.stderr)
    if len(views) < 3:
        print("need at least 3 usable views", file=sys.stderr)
        return ApplicationErrorCode.BAD_DATA

    gx, gy = np.meshgrid(np.arange(args.cols), np.arange(args.rows))
    board = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float64)
    board *= args.square_size
    image_points = jnp.asarray(np.stack(views), jnp.float64)
    weights = jnp.ones(image_points.shape[:2], jnp.float64)
    result = calibrate_planar(jnp.asarray(board), image_points, weights,
                              estimate_distortion=args.distortion)
    K = np.asarray(result.K)
    print(f"K =\n{K.round(3)}")
    print(f"rms reprojection error: {float(result.rms_error):.4f} px")
    if args.distortion:
        k1, k2 = (float(x) for x in np.asarray(result.dist))
        print(f"radial distortion: k1={k1:.6f} k2={k2:.6f}")
    if args.undistort_preview:
        from mvslam_tpu.io import save_image
        from mvslam_tpu.ops.calibration import undistort_image

        first = next(iter(iter_directory(args.image_dir, args.extension)))
        und = undistort_image(
            jnp.asarray(load_image_grayscale(first), jnp.float64),
            result.K, result.dist,
        )
        save_image(args.undistort_preview, np.asarray(und))
        print(f"wrote undistorted preview {args.undistort_preview}")
    cam = PinholeCamera.from_params(
        K[0, 0], K[1, 1], K[0, 1], K[0, 2], K[1, 2], dtype=jnp.float64
    )
    cam.save_to_file(args.out_config)
    print(f"wrote {args.out_config}")
    return ApplicationErrorCode.NONE


if __name__ == "__main__":
    raise SystemExit(main())
