from mvslam_tpu.frontend.data_types import Frame as Frame  # noqa: F401
from mvslam_tpu.frontend.data_types import generate_frame_id as generate_frame_id  # noqa: F401
from mvslam_tpu.frontend.frame_manager import FrameManager as FrameManager  # noqa: F401
from mvslam_tpu.frontend.frame_manager import FpsEstimator as FpsEstimator  # noqa: F401
from mvslam_tpu.frontend.camera_manager import CameraManager as CameraManager  # noqa: F401
from mvslam_tpu.frontend.image_pair import ImagePair as ImagePair  # noqa: F401
from mvslam_tpu.frontend.image_pair import ImagePairParams as ImagePairParams  # noqa: F401
from mvslam_tpu.frontend.visual_odometer import (  # noqa: F401
    TrackResult as TrackResult,
    VisualOdometer as VisualOdometer,
    VoParams as VoParams,
    VoState as VoState,
)
