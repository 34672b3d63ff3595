from mvslam_tpu.ops.camera import PinholeCamera as PinholeCamera  # noqa: F401
