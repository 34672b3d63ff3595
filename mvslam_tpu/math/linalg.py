"""Batched small-matrix linear algebra helpers.

Replaces the reference's OpenCV/Eigen SVD wrapper (``source/math/svd.hpp``)
with jit/vmap-friendly primitives used by the geometry ops: homogeneous
null-space extraction (DLT solves), SO(3) projection, and PSD solves.
All functions are batched over leading dims and dtype-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smallest_eigvec_psd(M: Array) -> Array:
    """Unit eigenvector of the smallest eigenvalue of a symmetric PSD matrix.

    Used for homogeneous least squares ``argmin |A x|, |x|=1`` via
    ``M = A^T A`` — the TPU-friendly replacement for taking the last right
    singular vector of ``A`` (reference ``math/svd.hpp`` usage in
    ``vision/fundamental-matrix.cpp:119-127`` and ``vision/sfm-solve.cpp:192-199``).
    """
    _, vecs = jnp.linalg.eigh(M)
    return vecs[..., :, 0]


def homogeneous_solve(A: Array) -> Array:
    """argmin_{|x|=1} |A x| for (..., m, n): smallest right singular vector."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    return smallest_eigvec_psd(AtA)


def project_to_so3(M: Array) -> Array:
    """Nearest rotation matrix (Frobenius): ``U diag(1,1,det(UV^T)) V^T``."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(M.shape[:-2] + (3,), dtype=M.dtype)
    D = D.at[..., 2].set(det)
    return (U * D[..., None, :]) @ Vt


def solve_psd(A: Array, b: Array, jitter: float = 0.0) -> Array:
    """Solve ``A x = b`` for symmetric positive definite ``A`` via Cholesky."""
    if jitter:
        A = A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0]


def inv_psd(A: Array, jitter: float = 0.0) -> Array:
    """Inverse of a symmetric positive definite matrix via Cholesky."""
    if jitter:
        A = A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def inv3x3(A: Array) -> Array:
    """Closed-form 3x3 inverse (adjugate/determinant) — cheaper than a
    factorization for the landmark blocks of the Schur complement."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]
