"""mvslam_tpu — a TPU-native monocular visual SLAM framework.

A from-scratch rebuild of the capabilities of the C++ reference
``lonelycorn/mvSLAM`` (see SURVEY.md) as batched, statically-shaped,
jit-compiled JAX/XLA/Pallas array programs:

- ``mvslam_tpu.math``      — SO3/SE3 Lie groups, batched small-matrix linear
  algebra, Kalman filtering, signal processing (reference: ``source/math/``).
- ``mvslam_tpu.ops``       — the numerical vision ops: pinhole camera,
  epipolar geometry (8-point + vectorized RANSAC), triangulation, SfM,
  PnP, Levenberg-Marquardt bundle adjustment with Schur complement, pose
  graph optimization, ORB-style features and Hamming matching
  (reference: ``source/vision/``, gtsam/OpenCV replaced by our own solvers).
- ``mvslam_tpu.frontend``  — frame store, image pairs, the visual-odometer
  tracking state machine (reference: ``source/front-end/``).
- ``mvslam_tpu.backend``   — pose-graph Graph/GraphOptimizer
  (reference: ``source/back-end/``).
- ``mvslam_tpu.parallel``  — device meshes and distributed (sharded) bundle
  adjustment over ICI/DCN collectives (no reference equivalent; the
  reference is single-process CPU).
- ``mvslam_tpu.io``        — images, dataset manifests, camera/config files,
  checkpointing (reference: ``source/base/image.*``, ``utility/``).
- ``mvslam_tpu.viz``       — trajectory/point-cloud export (replaces the
  reference's interactive PCL/OpenCV viewers with file dumps).
- ``mvslam_tpu.apps``      — CLI applications (reference: ``utility/``).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# SLAM geometry is precision-critical: TPU's default bf16 matmul passes turn
# camera/epipolar math into ~1e-2 error (measured on-chip; float32 precision
# restores ~1e-7). Hot throughput kernels opt into bf16/int8 explicitly via
# preferred_element_type in their pallas/dot calls.
_jax.config.update("jax_default_matmul_precision", "float32")

# the TPU runtime environment pins JAX_PLATFORMS at the site level, so that
# env var cannot express "run this app on CPU". MVSLAM_PLATFORM is this
# package's own override (used by subprocess tests and CPU-only tooling);
# jax honors config updates over the env default.
if _os.environ.get("MVSLAM_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["MVSLAM_PLATFORM"])

from mvslam_tpu import config as config  # noqa: F401, E402
from mvslam_tpu.math import lie as lie  # noqa: F401
from mvslam_tpu.math import linalg as linalg  # noqa: F401
from mvslam_tpu.math.lie import SE3 as SE3  # noqa: F401
from mvslam_tpu.ops.camera import PinholeCamera as PinholeCamera  # noqa: F401
