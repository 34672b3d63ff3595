"""Threaded visualizer + sync-primitive tests (reference visualization/os
layers; the reference only has manual viewer drivers in ``utility/``, so
these asserted tests exceed its coverage)."""

import os
import threading
import time

import numpy as np
import pytest

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.utils.sync import Event, Lock, Mutex
from mvslam_tpu.viz import Visualizer2d, Visualizer3d
from mvslam_tpu.viz.viewer import Visualizer3dParams


def _wait_for(path, timeout=20.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path) and os.path.getsize(path) > 0:
            return True
        time.sleep(0.05)
    return False


def test_mutex_is_recursive():
    m = Mutex()
    with m:
        with m:  # reference os/mutex.cpp:29 chooses a recursive mutex
            pass
    with Lock(m):
        pass


def test_event_trigger_all_wakes_all_waiters():
    ev = Event()
    woke = []

    def waiter(i):
        ev.wait()
        woke.append(i)

    threads = [threading.Thread(target=waiter, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.2)
    ev.trigger_all()
    for t in threads:
        t.join(timeout=5.0)
    assert sorted(woke) == [0, 1, 2, 3]


def test_event_wait_timeout():
    ev = Event()
    t0 = time.time()
    assert not ev.wait_timeout(100)
    assert time.time() - t0 < 5.0
    ev.trigger_all()
    # a trigger BEFORE the wait is not consumed retroactively (generation
    # counter semantics: waiters observe triggers that happen while waiting)
    assert not ev.wait_timeout(50)


def test_visualizer3d_renders_scene(tmp_path):
    v = Visualizer3d(str(tmp_path), Visualizer3dParams(view_cadence_ms=20))
    rng = np.random.default_rng(0)
    v.set_point_cloud(0, rng.normal(size=(50, 3)))
    v.set_camera_pose(0, SE3(np.eye(3), np.zeros(3)))
    v.set_camera_pose(1, SE3(np.eye(3), np.array([1.0, 0, 0])))
    assert _wait_for(v.window_path)
    assert not v.is_window_closed()
    v.close()
    assert v.is_window_closed()
    from PIL import Image

    img = Image.open(v.window_path)
    assert img.size[0] > 100 and img.size[1] > 100


def test_visualizer2d_keyframe_and_pair(tmp_path):
    v = Visualizer2d(str(tmp_path))
    img = np.zeros((64, 80), np.float32)
    xy = np.array([[10.0, 10.0], [40.0, 30.0], [70.0, 50.0]])
    v.show_keyframe(img, xy)
    assert _wait_for(v.window_path)
    idx = np.array([0, 1, 2])
    v.show_matched_pair(img, xy, img, xy, idx,
                        np.array([True, True, False]),
                        inlier_mask=np.array([True, False, False]))
    v.close()
    files = sorted(os.listdir(tmp_path))
    assert any(f.startswith("view2d_") for f in files)
    from PIL import Image

    pair = Image.open(os.path.join(tmp_path, files[-1]))
    assert pair.size  # decodable PNG
