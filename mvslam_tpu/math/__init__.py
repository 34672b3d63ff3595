from mvslam_tpu.math import lie as lie  # noqa: F401
from mvslam_tpu.math import linalg as linalg  # noqa: F401
from mvslam_tpu.math.lie import SE3 as SE3  # noqa: F401
