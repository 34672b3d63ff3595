"""Batched SO(3)/SE(3) Lie-group operations.

Functional, dtype-polymorphic and fully batched (arbitrary leading dims);
everything is jit/vmap/grad-safe, with Taylor fallbacks guarded by
``jnp.where`` on safe denominators.

Conventions (matching the reference ``source/math/lie-group.hpp``):
- se(3) tangent layout is **translation-first**: ``xi = [u, w]`` with ``u``
  the translation part and ``w`` the rotation part (ethaneade.org/lie.pdf;
  reference ``SE3::exp`` at ``lie-group.hpp:275-299`` and ``SE3::ln`` at
  ``:245-269``).
- ``SO3(roll, pitch, yaw)`` composes ``Rz(yaw) @ Ry(pitch) @ Rx(roll)``
  (reference ``lie-group.hpp:41-56``).
- ``SE3`` acts on points as ``R @ p + t``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu import config

Array = jax.Array


# ---------------------------------------------------------------------------
# so(3)
# ---------------------------------------------------------------------------


def skew(v: Array) -> Array:
    """Skew-symmetric (cross-product) matrix; ``skew(a) @ b == cross(a, b)``.

    Reference ``math/lie-group.cpp:5-14``. Batched over leading dims.
    """
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(M: Array) -> Array:
    """Inverse of :func:`skew` for (anti-symmetrized) matrices."""
    return jnp.stack(
        [M[..., 2, 1] - M[..., 1, 2],
         M[..., 0, 2] - M[..., 2, 0],
         M[..., 1, 0] - M[..., 0, 1]],
        axis=-1,
    ) * 0.5


def _sincos_coeffs(theta2: Array, dtype) -> tuple[Array, Array, Array]:
    """A = sin(t)/t, B = (1-cos(t))/t^2, C = (1-A)/t^2, Taylor-guarded.

    Matches reference ``SE3::exp`` coefficients (``lie-group.hpp:279-294``).
    """
    thr2 = config.taylor_threshold(dtype) ** 2
    small = theta2 < thr2
    # safe theta for the trig branch
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_t = jnp.sqrt(safe_t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / safe_t2)
    return A, B, C


def so3_exp(w: Array) -> Array:
    """Rodrigues' formula: axis-angle (...,3) -> rotation matrix (...,3,3).

    Reference ``rodrigues`` (``math/lie-group.cpp:16-32``).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sincos_coeffs(theta2, w.dtype)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R: Array) -> Array:
    """Rotation matrix -> axis-angle; inverse of :func:`so3_exp`.

    Reference ``SO3::ln`` (``math/lie-group.hpp:138-162``): the returned
    vector is ``vee(R - R^T) * theta / (2 sin(theta))`` with a Taylor branch
    for small angles. Like the reference, angles near pi lose precision.
    """
    dtype = R.dtype
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    v = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2],
         R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    thr = config.taylor_threshold(dtype)
    small = cos_theta > jnp.cos(jnp.asarray(thr, dtype))
    # Differentiability: arccos has an infinite derivative at +-1, and a NaN
    # there leaks through jnp.where in reverse/forward mode (the classic
    # where-grad trap). Feed arccos a guarded input and use a differentiable
    # theta^2 surrogate |v|^2/4 ~ sin^2(theta) in the Taylor branch, so BA /
    # pose-graph Jacobians of near-identity residuals are exact and finite.
    t2_small = 0.25 * jnp.sum(v * v, axis=-1)
    safe_cos = jnp.where(small, jnp.zeros_like(cos_theta), cos_theta)
    theta = jnp.arccos(safe_cos)
    sin_theta = jnp.sin(theta)
    # guard sin(theta) ~ 0 away from 0 (theta ~ pi; like the reference, log
    # loses precision there)
    sin_theta = jnp.where(
        jnp.abs(sin_theta) < config.epsilon(dtype),
        jnp.full_like(sin_theta, config.epsilon(dtype)),
        sin_theta,
    )
    A = jnp.where(
        small, (1.0 + t2_small / 6.0) * 0.5, 0.5 * theta / sin_theta
    )
    return v * A[..., None]


def so3_rectify(R: Array) -> Array:
    """Gram-Schmidt re-orthonormalization over the rows (reference
    ``SO3::rectify``, ``math/lie-group.hpp:84-96``)."""
    u0 = R[..., 0, :]
    u0 = u0 / jnp.linalg.norm(u0, axis=-1, keepdims=True)
    u1 = R[..., 1, :]
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u2 = jnp.cross(u0, u1)
    return jnp.stack([u0, u1, u2], axis=-2)


def so3_from_rpy(roll: Array, pitch: Array, yaw: Array, dtype=None) -> Array:
    """Tait-Bryan z-y-x'' construction: ``Rz(yaw) @ Ry(pitch) @ Rx(roll)``
    (reference ``lie-group.hpp:41-56``)."""
    roll, pitch, yaw = (jnp.asarray(a, dtype=dtype) for a in (roll, pitch, yaw))
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def so3_adjoint(R: Array) -> Array:
    """Adjoint of SO(3) is the rotation matrix itself:
    ``R exp(w^) R^T = exp((R w)^)`` (reference ``SO3::adjoint``,
    ``math/lie-group.hpp:124-136``)."""
    return R


def so3_rpy(R: Array) -> tuple[Array, Array, Array]:
    """(roll, pitch, yaw) extraction (reference ``lie-group.hpp:98-111``)."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


class SE3(NamedTuple):
    """Rigid transform, a pytree of a rotation block and a translation.

    ``R``: (..., 3, 3) rotation matrices; ``t``: (..., 3) translations.
    Acts on points as ``R @ p + t`` (reference ``SE3::operator*``).
    """

    R: Array
    t: Array

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity(batch_shape: tuple = (), dtype=config.DEFAULT_DTYPE) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return SE3(R, t)

    @staticmethod
    def exp(xi: Array) -> "SE3":
        """Exponential map; ``xi = [u, w]`` translation-first (...,6).

        Reference ``SE3::exp`` (``math/lie-group.hpp:275-299``).
        """
        u, w = xi[..., :3], xi[..., 3:]
        theta2 = jnp.sum(w * w, axis=-1)
        A, B, C = _sincos_coeffs(theta2, xi.dtype)
        K = skew(w)
        K2 = K @ K
        eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
        R = eye + A[..., None, None] * K + B[..., None, None] * K2
        V = eye + B[..., None, None] * K + C[..., None, None] * K2
        t = jnp.einsum("...ij,...j->...i", V, u)
        return SE3(R, t)

    @staticmethod
    def from_matrix(M: Array) -> "SE3":
        return SE3(M[..., :3, :3], M[..., :3, 3])

    # -- group ops -----------------------------------------------------------
    def compose(self, other: "SE3") -> "SE3":
        R = self.R @ other.R
        t = jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t
        return SE3(R, t)

    def __matmul__(self, other: "SE3") -> "SE3":
        return self.compose(other)

    def inverse(self) -> "SE3":
        RT = jnp.swapaxes(self.R, -1, -2)
        return SE3(RT, -jnp.einsum("...ij,...j->...i", RT, self.t))

    def apply(self, p: Array) -> Array:
        """Transform points; supports broadcasting a single SE3 over (...,N,3)."""
        return jnp.einsum("...ij,...j->...i", self.R, p) + self.t

    def log(self) -> Array:
        """Logarithm map -> translation-first tangent (...,6).

        Reference ``SE3::ln`` (``math/lie-group.hpp:245-269``): computes
        ``V^{-1} = I - K/2 + G K^2`` with ``G = (1 - A/(2B)) / theta^2``.
        """
        dtype = self.R.dtype
        w = so3_log(self.R)
        theta2 = jnp.sum(w * w, axis=-1)
        thr2 = config.taylor_threshold(dtype) ** 2
        small = theta2 < thr2
        safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
        safe_t = jnp.sqrt(safe_t2)
        A = jnp.sin(safe_t) / safe_t
        B = (1.0 - jnp.cos(safe_t)) / safe_t2
        G = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - 0.5 * A / B) / safe_t2)
        K = skew(w)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)
        V_inv = eye - 0.5 * K + G[..., None, None] * (K @ K)
        u = jnp.einsum("...ij,...j->...i", V_inv, self.t)
        return jnp.concatenate([u, w], axis=-1)

    def adjoint(self) -> Array:
        """(..., 6, 6) adjoint: ``T exp(xi) T^-1 = exp(adjoint() @ xi)``.

        Translation-first tangent layout ``[u, w]`` (reference
        ``SE3::adjoint``, ``math/lie-group.hpp:236-244``):
        ``[[R, skew(t) R], [0, R]]``. Transports twists — and, as
        ``Ad S Ad^T``, 6x6 covariances — between frames.
        """
        tR = skew(self.t) @ self.R
        zero = jnp.zeros_like(self.R)
        top = jnp.concatenate([self.R, tR], axis=-1)
        bot = jnp.concatenate([zero, self.R], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    # -- representation --------------------------------------------------------
    def matrix(self) -> Array:
        """(..., 4, 4) homogeneous matrix (reference ``SE3::get_matrix``)."""
        batch = self.R.shape[:-2]
        bottom = jnp.broadcast_to(
            jnp.array([0, 0, 0, 1], dtype=self.R.dtype), batch + (1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def matrix3x4(self) -> Array:
        """(..., 3, 4) projection-style matrix (reference
        ``SE3_to_Matrix3x4Type``, ``math/lie-group.cpp``)."""
        return jnp.concatenate([self.R, self.t[..., None]], axis=-1)

    def astype(self, dtype) -> "SE3":
        return SE3(self.R.astype(dtype), self.t.astype(dtype))

    @property
    def batch_shape(self) -> tuple:
        return self.R.shape[:-2]


def se3_distance(T1: SE3, T2: SE3) -> Array:
    """Componentwise max |ln(T1) - ln(T2)| — the comparison used throughout the
    reference tests (``test/unit-test-helper.cpp:81-96``)."""
    return jnp.max(jnp.abs(T1.log() - T2.log()), axis=-1)
