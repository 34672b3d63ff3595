from mvslam_tpu.utils.logging import Logger as Logger, Logging as Logging  # noqa: F401
