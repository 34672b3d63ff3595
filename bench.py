"""Benchmark: tsukuba visual-odometry throughput on one chip.

Prints ONE JSON line:
  {"metric": "tsukuba_frames_per_s", "value": N, "unit": "frames/s/chip",
   "vs_baseline": N / 10.0}

Baseline note: the reference publishes no performance numbers
(``README.md:1-27``; BASELINE.json "published": {}). Its own FrameManager
test pins the tsukuba capture rate at 10 fps (``test-frame-manager.cpp:
12-14,44``) — the real-time envelope the reference targets on CPU — so
``vs_baseline`` is reported against 10 frames/s.

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TSUKUBA = "/root/reference/data/tsukuba"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_sequence(fm_cls, vo_cls, cam, images, orb_params):
    fm = fm_cls(camera=cam, orb_params=orb_params)
    vo = vo_cls()
    tracked = 0
    for i, img in enumerate(images):
        res = vo.add_frame(fm.add_frame(0.1 * (i + 1), img))
        tracked += bool(res.success)
    return tracked, vo


def main() -> None:
    from mvslam_tpu.frontend import FrameManager, VisualOdometer
    from mvslam_tpu.io import load_image_grayscale
    from mvslam_tpu.ops.camera import PinholeCamera
    from mvslam_tpu.ops.features import OrbParams

    log(f"devices: {jax.devices()}")
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    images = [load_image_grayscale(f"{TSUKUBA}/{i}.jpg") for i in range(1, 6)]
    orb = OrbParams()

    # warmup: compiles every kernel in the pipeline (cached across runs)
    t0 = time.time()
    tracked, _ = run_sequence(FrameManager, VisualOdometer, cam, images, orb)
    log(f"warmup pass: {time.time() - t0:.1f}s, tracked {tracked}/5")

    # timed passes over the full 5-frame pipeline (bootstrap + tracking)
    passes = 3
    n_frames = 0
    t0 = time.time()
    for _ in range(passes):
        tracked, vo = run_sequence(FrameManager, VisualOdometer, cam, images, orb)
        n_frames += len(images)
    elapsed = time.time() - t0
    fps = n_frames / elapsed
    log(f"timed: {n_frames} frames in {elapsed:.2f}s, "
        f"tracked {tracked}/5 last pass, map {vo.num_tracked_points}")

    print(json.dumps({
        "metric": "tsukuba_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
