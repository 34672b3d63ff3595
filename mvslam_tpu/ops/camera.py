"""Pinhole camera model.

Rebuild of the reference ``source/vision/camera.{hpp,cpp}``:
- intrinsics ``K`` (fx, fy, shear, px, py),
- extrinsics ``P`` = world -> camera SE3,
- batched project (world -> pixel) and normalize (pixel -> ideal ray),
- text-file load/save in the reference's exact format
  (``camera.cpp:105-142``): line 1 = ``fx fy shear px py``, line 2 = the
  6-dof se3 of ``P`` (translation-first tangent).

Unlike the reference's per-point loops (``camera.cpp:41-53,67-79``), all ops
take ``(..., 3)`` / ``(..., 2)`` stacked points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.math.lie import SE3

Array = jax.Array


class PinholeCamera(NamedTuple):
    """Camera = intrinsics + world->camera extrinsics (a pytree)."""

    K: Array        # (3, 3) intrinsics
    P: SE3          # world -> camera

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def create(K=None, P: SE3 | None = None, dtype=jnp.float32) -> "PinholeCamera":
        if K is None:
            K = jnp.eye(3, dtype=dtype)
        else:
            K = jnp.asarray(K, dtype=dtype)
        if P is None:
            P = SE3.identity(dtype=dtype)
        return PinholeCamera(K, P)

    @staticmethod
    def from_params(fx, fy, shear, px, py, P: SE3 | None = None,
                    dtype=jnp.float32) -> "PinholeCamera":
        K = jnp.asarray(
            [[fx, shear, px], [0.0, fy, py], [0.0, 0.0, 1.0]], dtype=dtype
        )
        if P is None:
            P = SE3.identity(dtype=dtype)
        return PinholeCamera(K, P)

    # -- cached-equivalents (the reference caches K_inv / P_inv; here they are
    #    cheap jit-time constants) ------------------------------------------
    @property
    def K_inv(self) -> Array:
        return jnp.linalg.inv(self.K)

    @property
    def P_inv(self) -> SE3:
        return self.P.inverse()

    # -- geometry -------------------------------------------------------------
    def project_points(self, points_world: Array) -> Array:
        """World points (..., 3) -> pixel coordinates (..., 2).

        Reference ``project_point`` (``camera.cpp:24-39``); the z>0 assert
        becomes the caller's responsibility (use :meth:`point_depths`).
        """
        p_cam = self.P.apply(points_world)
        p_norm = p_cam[..., :2] / p_cam[..., 2:3]
        ones = jnp.ones_like(p_norm[..., :1])
        p_h = jnp.concatenate([p_norm, ones], axis=-1)
        p_raw = jnp.einsum("ij,...j->...i", self.K, p_h)
        return p_raw[..., :2]

    def point_depths(self, points_world: Array) -> Array:
        """Camera-frame z of world points — the cheirality quantity."""
        return self.P.apply(points_world)[..., 2]

    def normalize_points(self, image_points: Array) -> Array:
        """Pixel coordinates (..., 2) -> ideal homogeneous rays (..., 3)
        with last coordinate 1 (reference ``normalize_point``,
        ``camera.cpp:55-65``)."""
        ones = jnp.ones_like(image_points[..., :1])
        p_h = jnp.concatenate([image_points, ones], axis=-1)
        return jnp.einsum("ij,...j->...i", self.K_inv, p_h)

    # -- IO (host-side, exact reference text format) -------------------------
    def save_to_file(self, filename: str) -> None:
        K = np.asarray(self.K, dtype=np.float64)
        se3 = np.asarray(self.P.astype(jnp.float64).log()
                         if self.K.dtype == jnp.float64 else self.P.log(),
                         dtype=np.float64)
        with open(filename, "w") as f:
            f.write(f"{K[0,0]:.17g} {K[1,1]:.17g} {K[0,1]:.17g} "
                    f"{K[0,2]:.17g} {K[1,2]:.17g}\n")
            f.write(" ".join(f"{v:.17g}" for v in se3) + "\n")

    @staticmethod
    def load_from_file(filename: str, dtype=jnp.float32) -> "PinholeCamera":
        with open(filename, "r") as f:
            values = f.read().split()
        fx, fy, shear, px, py = (float(v) for v in values[:5])
        se3 = np.array([float(v) for v in values[5:11]], dtype=np.float64)
        P = SE3.exp(jnp.asarray(se3, dtype=dtype))
        return PinholeCamera.from_params(fx, fy, shear, px, py, P, dtype=dtype)
