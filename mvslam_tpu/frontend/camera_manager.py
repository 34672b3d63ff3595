"""CameraManager: THE camera of the rig.

Rebuild of the reference singleton (``front-end/camera-manager.{hpp,cpp}``):
holds one :class:`PinholeCamera` (default: identity-intrinsics ideal
camera), with load/save in the reference text format.
"""

from __future__ import annotations

import threading

from mvslam_tpu.ops.camera import PinholeCamera


class CameraManager:
    _global: "CameraManager | None" = None

    def __init__(self, camera: PinholeCamera | None = None) -> None:
        self._lock = threading.Lock()
        self._camera = camera if camera is not None else PinholeCamera.create()

    @classmethod
    def global_instance(cls) -> "CameraManager":
        if cls._global is None:
            cls._global = CameraManager()
        return cls._global

    def get_camera(self) -> PinholeCamera:
        with self._lock:
            return self._camera

    def set_camera(self, camera: PinholeCamera) -> None:
        with self._lock:
            self._camera = camera

    def load_from_file(self, filename: str) -> PinholeCamera:
        cam = PinholeCamera.load_from_file(filename)
        self.set_camera(cam)
        return cam

    def save_to_file(self, filename: str) -> None:
        self.get_camera().save_to_file(filename)
