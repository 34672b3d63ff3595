"""SO3/SE3 tests — parity oracle: reference ``test/test-lie-group.cpp``."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.math.lie import (
    SE3,
    se3_distance,
    skew,
    so3_exp,
    so3_from_rpy,
    so3_log,
    so3_rectify,
    so3_rpy,
    vee,
)

from helpers import check_similar_se3, random_se3


def _tol(dtype):
    return 1e-9 if dtype == jnp.float64 else 2e-5


def test_skew_cross_product(rng, dtype):
    a = jnp.asarray(rng.normal(size=(17, 3)), dtype=dtype)
    b = jnp.asarray(rng.normal(size=(17, 3)), dtype=dtype)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", skew(a), b)),
        np.asarray(jnp.cross(a, b)),
        atol=_tol(dtype),
    )
    np.testing.assert_allclose(np.asarray(vee(skew(a))), np.asarray(a), atol=_tol(dtype))


def test_so3_exp_log_roundtrip(rng, dtype):
    # angles across the Taylor threshold and up to near pi
    mags = np.array([1e-9, 1e-7, 1e-5, 1e-3, 0.1, 1.0, 2.0, 3.0])
    axes = rng.normal(size=(len(mags), 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = jnp.asarray(axes * mags[:, None], dtype=dtype)
    R = so3_exp(w)
    w2 = so3_log(R)
    atol = 1e-7 if dtype == jnp.float64 else 2e-3
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=atol)


def test_so3_orthonormal(rng, dtype):
    w = jnp.asarray(rng.normal(size=(32, 3)), dtype=dtype)
    R = so3_exp(w)
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)),
        np.broadcast_to(eye, (32, 3, 3)),
        atol=100 * _tol(dtype),
    )
    det = np.asarray(jnp.linalg.det(R))
    np.testing.assert_allclose(det, 1.0, atol=100 * _tol(dtype))


def test_so3_rectify(rng, dtype):
    w = jnp.asarray(rng.normal(size=(8, 3)), dtype=dtype)
    R = so3_exp(w)
    noisy = R + jnp.asarray(rng.normal(size=R.shape) * 1e-4, dtype=dtype)
    R2 = so3_rectify(noisy)
    np.testing.assert_allclose(
        np.asarray(R2 @ jnp.swapaxes(R2, -1, -2)),
        np.broadcast_to(np.eye(3), R2.shape),
        atol=1e-5,
    )


def test_rpy_roundtrip(dtype):
    roll, pitch, yaw = 0.3, -0.4, 1.2
    R = so3_from_rpy(roll, pitch, yaw, dtype=dtype)
    r, p, y = so3_rpy(R)
    atol = 1e-9 if dtype == jnp.float64 else 1e-5
    np.testing.assert_allclose(float(r), roll, atol=atol)
    np.testing.assert_allclose(float(p), pitch, atol=atol)
    np.testing.assert_allclose(float(y), yaw, atol=atol)


def test_se3_exp_log_roundtrip(rng, dtype):
    # rotation magnitude kept < pi: beyond that, log() returns the equivalent
    # wrapped rotation and the round-trip is not the identity by construction
    xi = np.concatenate(
        [rng.normal(size=(64, 3)), rng.uniform(-1, 1, size=(64, 3)) * 0.9], axis=-1
    )
    xi = jnp.asarray(xi, dtype=dtype)
    T = SE3.exp(xi)
    xi2 = T.log()
    atol = 1e-7 if dtype == jnp.float64 else 1e-4
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=atol)


def test_se3_exp_small_angle(dtype):
    # near-zero rotation exercises the Taylor branch
    xi = jnp.asarray([[0.5, -0.2, 0.1, 1e-8, -1e-8, 1e-9]], dtype=dtype)
    T = SE3.exp(xi)
    np.testing.assert_allclose(np.asarray(T.t[0]), [0.5, -0.2, 0.1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(T.log()[0]), np.asarray(xi[0]), atol=1e-6)


def test_se3_compose_inverse(rng, dtype):
    T1 = random_se3(rng, 1.0, dtype=dtype)
    T2 = random_se3(rng, 1.0, dtype=dtype)
    T = T1 @ T2
    ident = T @ T.inverse()
    assert check_similar_se3(ident, SE3.identity(dtype=dtype), 1e-5)
    # associativity of action: (T1 T2) p == T1 (T2 p)
    p = jnp.asarray(rng.normal(size=(10, 3)), dtype=dtype)
    atol = 1e-9 if dtype == jnp.float64 else 1e-5
    np.testing.assert_allclose(
        np.asarray(T.apply(p)), np.asarray(T1.apply(T2.apply(p))), atol=atol
    )


def test_se3_matrix_roundtrip(rng, dtype):
    T = random_se3(rng, 1.0, dtype=dtype)
    M = T.matrix()
    T2 = SE3.from_matrix(M)
    assert check_similar_se3(T, T2, 1e-6)
    assert M.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(M[3]), [0, 0, 0, 1])


def test_se3_inverse_formula(rng, dtype):
    # inverse().t == -R^T t (reference lie-group.hpp:212-216)
    T = random_se3(rng, 0.7, dtype=dtype)
    Ti = T.inverse()
    atol = 1e-9 if dtype == jnp.float64 else 1e-5
    np.testing.assert_allclose(
        np.asarray(Ti.t), np.asarray(-(T.R.T @ T.t)), atol=atol
    )


def test_se3_distance(rng, dtype):
    T = random_se3(rng, 0.5, dtype=dtype)
    assert float(se3_distance(T, T)) < 1e-6
    T2 = random_se3(rng, 0.5, dtype=dtype)
    assert float(se3_distance(T, T2)) > 1e-3


@pytest.mark.parametrize("n", [1, 5])
def test_batched_shapes(rng, n, dtype):
    xi = jnp.asarray(rng.normal(size=(n, 4, 6)), dtype=dtype)
    T = SE3.exp(xi)
    assert T.R.shape == (n, 4, 3, 3)
    assert T.t.shape == (n, 4, 3)
    assert T.log().shape == (n, 4, 6)
    assert T.matrix().shape == (n, 4, 4, 4)


def test_se3_adjoint_defining_property(rng, dtype):
    # T exp(xi) T^-1 == exp(Ad_T xi) (reference lie-group.hpp:236-244)
    T = random_se3(rng, 0.6, dtype=dtype)
    xi = jnp.asarray(rng.normal(size=6) * 0.3, dtype=dtype)
    lhs = T.compose(SE3.exp(xi)).compose(T.inverse())
    rhs = SE3.exp(T.adjoint() @ xi)
    tol = 1e-9 if dtype == jnp.float64 else 1e-5
    assert float(se3_distance(lhs, rhs)) < tol


def test_so3_adjoint_is_rotation(rng, dtype):
    from mvslam_tpu.math.lie import so3_adjoint, so3_exp

    w = jnp.asarray(rng.normal(size=3) * 0.4, dtype=dtype)
    R = so3_exp(w)
    v = jnp.asarray(rng.normal(size=3), dtype=dtype)
    lhs = R @ so3_exp(v) @ R.T
    rhs = so3_exp(so3_adjoint(R) @ v)
    atol = 1e-9 if dtype == jnp.float64 else 1e-5
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=atol)
