"""visual-odometer: replay a dataset directory through the VO pipeline.

Rebuild of the reference main app (``utility/visual-odometer.cpp:47-126``):
loads ``system.param`` (optional) + ``camera.config`` + the ``image.txt``
manifest from a dataset directory, feeds every frame through
FrameManager -> VisualOdometer, and reports ``frame_total/frame_tracked``.
The interactive 3D viewer becomes file exports: a TUM trajectory, a PLY
scene (map + camera frusta), and an optional checkpoint.

Usage:
    python -m mvslam_tpu.apps.visual_odometer DATASET_DIR
        [--out-dir OUT] [--checkpoint CKPT.npz] [--resume CKPT.npz]
        [--max-frames N] [--quiet]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from mvslam_tpu import config
from mvslam_tpu.frontend import FrameManager, VisualOdometer
from mvslam_tpu.io import load_image_grayscale, read_manifest
from mvslam_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.utils.errors import ApplicationErrorCode
from mvslam_tpu.viz import save_scene_ply, save_trajectory_tum


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="visual-odometer", description=__doc__)
    ap.add_argument("dataset", help="directory with camera.config + image.txt")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--checkpoint", default=None, help="save state here at end")
    ap.add_argument("--resume", default=None, help="restore state before replay")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    cam_path = os.path.join(args.dataset, "camera.config")
    manifest = os.path.join(args.dataset, "image.txt")
    if not os.path.isfile(cam_path):
        print(f"missing {cam_path}", file=sys.stderr)
        return ApplicationErrorCode.INVALID_ARGS
    param_path = os.path.join(args.dataset, "system.param")
    if os.path.isfile(param_path):
        config.load_from_file(param_path)
    if os.path.isfile(manifest):
        image_paths = read_manifest(manifest)
    else:
        from mvslam_tpu.io import iter_directory

        image_paths = list(iter_directory(args.dataset, ".jpg"))
    if not image_paths:
        print("no images found", file=sys.stderr)
        return ApplicationErrorCode.BAD_IO
    if args.max_frames:
        image_paths = image_paths[: args.max_frames]

    try:
        cam = PinholeCamera.load_from_file(cam_path)
    except Exception as e:
        print(f"bad camera config: {e}", file=sys.stderr)
        return ApplicationErrorCode.BAD_DATA

    fm = FrameManager(camera=cam)
    vo = VisualOdometer()
    if args.resume:
        load_checkpoint(args.resume, vo)

    # frame source: native C++ prefetch loader (decode-ahead) when
    # available, PIL otherwise
    from mvslam_tpu.io import native_loader

    def frames():
        if native_loader.available() and all(
            p.lower().endswith((".jpg", ".jpeg")) for p in image_paths
        ):
            import jax.numpy as jnp

            with native_loader.PrefetchLoader(image_paths) as it:
                for i, arr in it:
                    yield i, image_paths[i], jnp.asarray(arr)
        else:
            for i, path in enumerate(image_paths):
                yield i, path, load_image_grayscale(path)

    t_start = time.time()
    try:
        frame_iter = frames()
    except Exception as e:
        print(f"cannot open frame source: {e}", file=sys.stderr)
        return ApplicationErrorCode.BAD_IO
    for i, path, img in frame_iter:
        frame = fm.add_frame(0.1 * (i + 1), img)
        res = vo.add_frame(frame)
        if not args.quiet:
            pose = vo.get_camera_pose()
            t = None if pose is None else np.asarray(pose.t).round(4)
            print(
                f"frame {i + 1}/{len(image_paths)} [{os.path.basename(path)}]: "
                f"{'tracked' if res.success else 'lost'} ({res.reason}) "
                f"inliers={res.num_inliers} t={t}",
                file=sys.stderr,
            )
    elapsed = time.time() - t_start

    print(
        f"frame_total = {vo.frame_total}, frame_tracked = {vo.frame_tracked}, "
        f"map_points = {vo.num_tracked_points}, "
        f"fps = {vo.frame_total / max(elapsed, 1e-9):.2f}"
    )

    out_dir = args.out_dir or args.dataset
    os.makedirs(out_dir, exist_ok=True)
    if vo.trajectory:
        tum = os.path.join(out_dir, "trajectory.tum")
        save_trajectory_tum(tum, vo.trajectory)
        ply = os.path.join(out_dir, "scene.ply")
        save_scene_ply(
            ply, vo.get_tracked_points(), [p for _, _, p in vo.trajectory]
        )
        print(f"wrote {tum} and {ply}")
    if args.checkpoint:
        save_checkpoint(vo, args.checkpoint)
        print(f"wrote {args.checkpoint}")
    return ApplicationErrorCode.NONE


if __name__ == "__main__":
    raise SystemExit(main())
