from mvslam_tpu.utils.logging import Logger as Logger, Logging as Logging  # noqa: F401
from mvslam_tpu.utils.sync import (  # noqa: F401
    Event as Event,
    Lock as Lock,
    Mutex as Mutex,
)
