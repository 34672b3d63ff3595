from mvslam_tpu.backend.graph import Graph as Graph  # noqa: F401
from mvslam_tpu.backend.graph import GraphOptimizer as GraphOptimizer  # noqa: F401
from mvslam_tpu.backend import pose_graph as pose_graph  # noqa: F401
from mvslam_tpu.backend import sim3_graph as sim3_graph  # noqa: F401
from mvslam_tpu.backend.slam import (  # noqa: F401
    BackendParams as BackendParams,
    PoseGraphBackend as PoseGraphBackend,
)
