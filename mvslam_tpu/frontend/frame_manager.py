"""FrameManager: frame registry + FPS estimation.

Rebuild of the reference singleton (``front-end/frame-manager.{hpp,cpp}``):
``add_frame(time, image)`` runs feature extraction and registers the frame;
an id->frame map with erase/get/size; throughput estimated by a 2-state
(frame-count, rate) Kalman filter (``frame-manager.cpp:11-102``:
F = [[1, dt], [0, 1]], H = [1, 0]).

Differences by design: no process-global mutable singleton is required —
construct instances freely; ``FrameManager.global_instance()`` exists for
reference-API parity. Extraction is the jitted TPU kernel
(:func:`mvslam_tpu.ops.features.orb_detect`), not OpenCV.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import jax.numpy as jnp

from mvslam_tpu.frontend.data_types import Frame, generate_frame_id
from mvslam_tpu.math.kalman import KFState, kf_init, kf_measurement_update, kf_process_update
from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.ops.features import OrbParams, orb_detect
from mvslam_tpu.ops.klt import smooth_image


class FpsEstimator:
    """Kalman-filtered frames-per-second estimate.

    State = (frame count, rate); process noise and measurement noise follow
    the reference's tuning shape (``frame-manager.cpp:87-91``).
    """

    def __init__(self, process_noise: float = 1e-4, measurement_noise: float = 1e-2):
        self._state: Optional[KFState] = None
        self._last_time: Optional[float] = None
        self._count = 0
        self._q = process_noise
        self._r = measurement_noise

    def update(self, capture_time: float) -> float:
        self._count += 1
        if self._state is None:
            self._state = kf_init(
                jnp.asarray([1.0, 0.0]), jnp.eye(2) * 1e3
            )
            self._last_time = capture_time
            return 0.0
        dt = max(capture_time - self._last_time, 1e-6)
        self._last_time = capture_time
        F = jnp.asarray([[1.0, dt], [0.0, 1.0]])
        Q = self._q * jnp.asarray([[dt * dt, 0.0], [0.0, 1.0]])
        self._state, _ = kf_process_update(self._state, F, Q)
        H = jnp.asarray([[1.0, 0.0]])
        R = jnp.asarray([[self._r]])
        z = jnp.asarray([float(self._count)])
        self._state, _ = kf_measurement_update(self._state, H, z, R)
        return float(self._state.x[1])

    @property
    def fps(self) -> float:
        return 0.0 if self._state is None else float(self._state.x[1])


class FrameManager:
    """Owns all live frames (reference ``frame-manager.cpp:104-193``)."""

    _global: "FrameManager | None" = None

    def __init__(
        self,
        camera: PinholeCamera | None = None,
        orb_params: OrbParams = OrbParams(),
    ) -> None:
        self._frames: Dict[int, Frame] = {}
        self._lock = threading.Lock()
        self._fps = FpsEstimator()
        self._orb_params = orb_params
        self._camera = camera if camera is not None else PinholeCamera.create()

    @classmethod
    def global_instance(cls) -> "FrameManager":
        if cls._global is None:
            cls._global = FrameManager()
        return cls._global

    @property
    def camera(self) -> PinholeCamera:
        return self._camera

    def set_camera(self, camera: PinholeCamera) -> None:
        self._camera = camera

    def add_frame(self, capture_time: float, image) -> Frame:
        """Extract features + register (reference ``frame-manager.cpp:107-125``)."""
        feats = orb_detect(image, self._orb_params)
        rays = self._camera.normalize_points(feats.xy)
        # keypoint sigma (reference: 2^octave * 0.5 px) converted to ideal
        # units by the focal length, so BA weights are statistically correct
        fx = self._camera.K[0, 0]
        fy = self._camera.K[1, 1]
        frame = Frame(
            id=generate_frame_id(),
            capture_time=capture_time,
            features=feats,
            rays=rays,
            sigma=feats.sigma / fx,
            focal=float(jnp.sqrt(fx * fy)),
            camera=self._camera,
            image=image,
            image_smooth=smooth_image(image),
        )
        with self._lock:
            self._frames[frame.id] = frame
            self._fps.update(capture_time)
        return frame

    def get_frame(self, frame_id: int) -> Frame:
        with self._lock:
            return self._frames[frame_id]

    def erase_frame(self, frame_id: int) -> None:
        with self._lock:
            self._frames.pop(frame_id, None)

    def size(self) -> int:
        with self._lock:
            return len(self._frames)

    def get_fps(self) -> float:
        return self._fps.fps
