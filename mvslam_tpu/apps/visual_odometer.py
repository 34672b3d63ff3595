"""visual-odometer: replay a dataset directory through the VO pipeline.

Rebuild of the reference main app (``utility/visual-odometer.cpp:47-126``):
loads ``system.param`` (optional) + ``camera.config`` + the ``image.txt``
manifest from a dataset directory, feeds every frame through
FrameManager -> VisualOdometer, and reports ``frame_total/frame_tracked``.
The interactive 3D viewer becomes file exports: a TUM trajectory, a PLY
scene (map + camera frusta), and an optional checkpoint.

With ``--pose-graph`` the replay runs the FUSED tracker with the pose-graph
back-end attached (keyframe skeleton + loop-closure detection + pose-graph
LM; ``mvslam_tpu.backend.slam`` — the integration the reference designed
but never wired, SURVEY §2.5) and additionally writes the optimized
trajectory as ``trajectory_optimized.tum``.

Usage:
    python -m mvslam_tpu.apps.visual_odometer DATASET_DIR
        [--out-dir OUT] [--checkpoint CKPT.npz] [--resume CKPT.npz]
        [--max-frames N] [--quiet] [--pose-graph] [--keyframe-every N]
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


def _run_pose_graph(args, cam, image_paths) -> int:
    """Fused tracker + pose-graph back-end replay (``--pose-graph``)."""
    import jax
    import jax.numpy as jnp

    from mvslam_tpu.backend.slam import BackendParams, PoseGraphBackend
    from mvslam_tpu.frontend.vo_jit import (
        VoJitParams, make_vo_step, vo_init_state,
    )
    from mvslam_tpu.math.lie import SE3

    K = np.asarray(cam.K, np.float64)
    K_inv = jnp.asarray(np.linalg.inv(K), jnp.float32)
    focal = float(K[0, 0])
    focal_j = jnp.asarray(focal, jnp.float32)
    params = VoJitParams()
    step = make_vo_step(params)
    backend = PoseGraphBackend(
        BackendParams(keyframe_every=args.keyframe_every), focal=focal
    )
    state = vo_init_state(params)
    t_start = time.time()
    for i, path in enumerate(image_paths):
        img = load_image_grayscale(path)
        state, out = step(state, jnp.asarray(img), K_inv, focal_j)
        loops = backend.add_frame(i, state, out)
        if not args.quiet:
            t = np.asarray(out.pose_t).round(4)
            extra = f" LOOP->kf{loops}" if loops else ""
            print(
                f"frame {i + 1}/{len(image_paths)} "
                f"[{os.path.basename(path)}]: "
                f"{'tracked' if bool(out.success) else 'lost'} "
                f"inliers={int(out.num_inliers)} t={t}{extra}",
                file=sys.stderr,
            )
    elapsed = time.time() - t_start
    n_tracked = int(state.frame_tracked)
    print(
        f"frame_total = {int(state.frame_total)}, "
        f"frame_tracked = {n_tracked}, "
        f"keyframes = {len(backend.keyframes)}, "
        f"loop_edges = {len(backend.loop_edges)}, "
        f"fps = {len(image_paths) / max(elapsed, 1e-9):.2f}"
    )

    out_dir = args.out_dir or args.dataset
    os.makedirs(out_dir, exist_ok=True)
    raw_traj = [
        (idx, 0.1 * (idx + 1), SE3(jnp.asarray(R), jnp.asarray(t)))
        for idx, R, t in backend._raw_poses
    ]
    if raw_traj:
        tum = os.path.join(out_dir, "trajectory.tum")
        save_trajectory_tum(tum, raw_traj)
        pts = np.asarray(state.map_pos)[np.asarray(state.map_valid)]
        ply = os.path.join(out_dir, "scene.ply")
        save_scene_ply(ply, pts, [p for _, _, p in raw_traj])
        print(f"wrote {tum} and {ply}")
    if len(backend.keyframes) >= 2:
        opt = backend.optimize()
        corrected = backend.correct_trajectory(opt)
        opt_traj = [
            (idx, 0.1 * (idx + 1), SE3(jnp.asarray(R), jnp.asarray(t)))
            for idx, R, t in corrected
        ]
        tum_opt = os.path.join(out_dir, "trajectory_optimized.tum")
        save_trajectory_tum(tum_opt, opt_traj)
        print(f"wrote {tum_opt}")
    return ApplicationErrorCode.NONE


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="visual-odometer", description=__doc__)
    ap.add_argument("dataset", help="directory with camera.config + image.txt")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--checkpoint", default=None, help="save state here at end")
    ap.add_argument("--resume", default=None, help="restore state before replay")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--pose-graph", action="store_true",
                    help="fused tracker + keyframe/loop-closure back-end")
    ap.add_argument("--keyframe-every", type=int, default=5,
                    help="tracked frames per keyframe (with --pose-graph)")
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

    if args.pose_graph:
        return _run_pose_graph(args, cam, image_paths)

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
