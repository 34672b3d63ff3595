"""Small linear algebra tests — parity oracle: reference ``test/test-svd.cpp``."""

import jax.numpy as jnp
import numpy as np

from mvslam_tpu.math.linalg import (
    homogeneous_solve,
    inv3x3,
    inv_psd,
    project_to_so3,
    smallest_eigvec_psd,
    solve_psd,
)
from mvslam_tpu.math.lie import so3_exp


def test_homogeneous_nullspace(rng, dtype):
    # A with a known null vector: parity with test-svd.cpp's homogeneous test
    x_true = rng.normal(size=5)
    x_true /= np.linalg.norm(x_true)
    # build A (8x5) orthogonal to x_true
    A = rng.normal(size=(8, 5))
    A = A - np.outer(A @ x_true, x_true)
    x = np.asarray(homogeneous_solve(jnp.asarray(A, dtype=dtype)))
    # direction match up to sign
    cos = abs(float(np.dot(x, x_true)))
    assert cos > (1 - 1e-9 if dtype == jnp.float64 else 1 - 1e-4)


def test_smallest_eigvec(rng, dtype):
    Q = np.linalg.qr(rng.normal(size=(6, 6)))[0]
    lams = np.array([1e-6, 1.0, 2.0, 3.0, 4.0, 5.0])
    M = Q @ np.diag(lams) @ Q.T
    v = np.asarray(smallest_eigvec_psd(jnp.asarray(M, dtype=dtype)))
    cos = abs(float(np.dot(v, Q[:, 0])))
    assert cos > 1 - 1e-4


def test_project_to_so3(rng, dtype):
    R_true = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(7, 3)), dtype=jnp.float64)))
    noisy = R_true * rng.uniform(0.5, 2.0)  # scaled rotations
    R = np.asarray(project_to_so3(jnp.asarray(noisy, dtype=dtype)))
    atol = 1e-7 if dtype == jnp.float64 else 1e-4
    np.testing.assert_allclose(R, R_true, atol=atol)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(7), atol=1e-5)


def test_solve_inv_psd(rng, dtype):
    A = rng.normal(size=(4, 9, 9))
    A = A @ np.swapaxes(A, -1, -2) + 9 * np.eye(9)
    b = rng.normal(size=(4, 9))
    x = np.asarray(solve_psd(jnp.asarray(A, dtype=dtype), jnp.asarray(b, dtype=dtype)))
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", A, x), b, atol=1e-8 if dtype == jnp.float64 else 1e-3
    )
    Ainv = np.asarray(inv_psd(jnp.asarray(A, dtype=dtype)))
    np.testing.assert_allclose(
        A @ Ainv, np.broadcast_to(np.eye(9), A.shape),
        atol=1e-8 if dtype == jnp.float64 else 1e-3,
    )


def test_inv3x3(rng, dtype):
    A = rng.normal(size=(32, 3, 3)) + 3 * np.eye(3)
    Ainv = np.asarray(inv3x3(jnp.asarray(A, dtype=dtype)))
    np.testing.assert_allclose(
        A @ Ainv, np.broadcast_to(np.eye(3), A.shape),
        atol=1e-9 if dtype == jnp.float64 else 1e-3,
    )


def test_smallest_eigvec_inverse_iteration_matches_eigh(rng, dtype):
    from mvslam_tpu.math.linalg import smallest_eigvec_psd, smallest_eigvec_psd_exact

    for n in (3, 4, 9, 12):
        # Gram matrices with a near-null direction (the DLT regime)
        A = rng.normal(size=(64, 2 * n, n))
        u, _, vt = np.linalg.svd(A, full_matrices=False)
        s = rng.uniform(1.0, 4.0, size=(64, n))
        s[:, -1] = rng.uniform(0, 1e-5, size=64)   # tiny smallest singular value
        A = u @ (s[..., None] * vt)
        M = jnp.asarray(np.swapaxes(A, -1, -2) @ A, dtype=dtype)
        v_fast = np.asarray(smallest_eigvec_psd(M))
        v_ref = np.asarray(smallest_eigvec_psd_exact(M))
        # compare up to sign
        dots = np.abs(np.sum(v_fast * v_ref, axis=-1))
        assert dots.min() > (1 - 1e-9 if dtype == jnp.float64 else 1 - 1e-4), dots.min()


def test_project_to_so3_newton_matches_svd(rng, dtype):
    from mvslam_tpu.math.linalg import project_to_so3, project_to_so3_svd

    M = rng.normal(size=(128, 3, 3))
    # include near-rotations, scaled rotations, and reflections
    M[:32] = np.linalg.qr(M[:32])[0] + 0.01 * rng.normal(size=(32, 3, 3))
    M[32:48] *= 5.0
    M[48:64] = -M[48:64]
    Mj = jnp.asarray(M, dtype=dtype)
    R_fast = np.asarray(project_to_so3(Mj))
    R_ref = np.asarray(project_to_so3_svd(Mj))
    tol = 1e-7 if dtype == jnp.float64 else 2e-3
    np.testing.assert_allclose(
        np.linalg.det(R_fast), 1.0, atol=10 * tol)
    np.testing.assert_allclose(
        R_fast @ np.swapaxes(R_fast, -1, -2),
        np.broadcast_to(np.eye(3), R_fast.shape), atol=10 * tol)
    # same Frobenius distance to M as the SVD answer (nearest-rotation tie
    # cases can differ in R yet match in distance)
    d_fast = np.linalg.norm(R_fast - M, axis=(-2, -1))
    d_ref = np.linalg.norm(R_ref - M, axis=(-2, -1))
    np.testing.assert_allclose(d_fast, d_ref, atol=20 * tol)
