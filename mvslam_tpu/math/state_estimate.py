"""Gaussian state estimates: mean + covariance pytrees.

Rebuild of the reference's ``StateEstimate<MeanType, CovarType>``
(``source/math/state-estimate.hpp:5-56``) and its aliases in
``source/base/data-type.hpp:24-53`` (``TransformationEstimate``,
``Point3Estimate``, ``Point2Estimate``). Instead of a templated C++ class,
these are NamedTuple pytrees that flow through jit/vmap; ``info()`` is the
inverse-covariance accessor the reference exposes, batched over leading axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3

Array = jax.Array


class StateEstimate(NamedTuple):
    """A Gaussian random variable: ``mean`` (..., N) + ``covar`` (..., N, N)."""

    mean: Array
    covar: Array

    def info(self) -> Array:
        """Information matrix (inverse covariance), batched."""
        return jnp.linalg.inv(self.covar)


class TransformationEstimate(NamedTuple):
    """SE3-valued Gaussian: mean pose + 6x6 covariance in the tangent space
    (translation-first layout, matching ``base/data-type.hpp:24-33``)."""

    mean: SE3
    covar: Array                # (..., 6, 6)

    def info(self) -> Array:
        return jnp.linalg.inv(self.covar)


def point3_estimate(mean: Array, covar: Array | None = None,
                    stddev: float | None = None) -> StateEstimate:
    """(..., 3) Point3Estimate; isotropic covariance from ``stddev`` if no
    full covariance is given (reference ``Point3Estimate``, data-type.hpp:38)."""
    if covar is None:
        s = 1.0 if stddev is None else stddev
        covar = jnp.broadcast_to(
            (s * s) * jnp.eye(3, dtype=mean.dtype), mean.shape + (3,)
        )
    return StateEstimate(mean, covar)


def point2_estimate(mean: Array, covar: Array | None = None,
                    stddev: float | None = None) -> StateEstimate:
    """(..., 2) Point2Estimate (reference ``Point2Estimate``,
    data-type.hpp:43); the per-keypoint isotropic sigma model
    (``visual-feature.cpp:192-207``) produces these."""
    if covar is None:
        s = 1.0 if stddev is None else stddev
        covar = jnp.broadcast_to(
            (s * s) * jnp.eye(2, dtype=mean.dtype), mean.shape + (2,)
        )
    return StateEstimate(mean, covar)
