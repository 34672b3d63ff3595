"""Kalman filter tests — parity oracle: reference ``test/test-kalman-filter.cpp``
(1-D moving mass simulated 100 steps; estimate within 2e-2 of truth)."""

import jax.numpy as jnp
import numpy as np

from mvslam_tpu.math.kalman import KFState, kf_init, kf_measurement_update, kf_process_update


def test_moving_mass_tracking(rng):
    dtype = jnp.float64
    # constant-velocity 1-D mass: state = [position, velocity]
    dt = 0.1
    v_true = 0.7
    steps = 100
    meas_noise = 1e-2

    F = jnp.asarray([[1.0, dt], [0.0, 1.0]], dtype=dtype)
    Q = jnp.eye(2, dtype=dtype) * 1e-6
    H = jnp.asarray([[1.0, 0.0]], dtype=dtype)
    R = jnp.asarray([[meas_noise**2]], dtype=dtype)

    state = kf_init(
        jnp.asarray([0.0, 0.0], dtype=dtype), jnp.eye(2, dtype=dtype) * 1.0
    )

    pos_true = 0.0
    for _ in range(steps):
        pos_true += v_true * dt
        z = jnp.asarray([pos_true + rng.normal(0, meas_noise)], dtype=dtype)
        state, ok = kf_process_update(state, F, Q)
        assert bool(ok)
        state, ok = kf_measurement_update(state, H, z, R)
        assert bool(ok)

    assert abs(float(state.x[0]) - pos_true) < 2e-2
    assert abs(float(state.x[1]) - v_true) < 2e-2


def test_control_input():
    dtype = jnp.float64
    F = jnp.eye(2, dtype=dtype)
    B = jnp.asarray([[1.0], [0.0]], dtype=dtype)
    u = jnp.asarray([0.5], dtype=dtype)
    Q = jnp.zeros((2, 2), dtype=dtype)
    state = kf_init(jnp.zeros(2, dtype=dtype), jnp.eye(2, dtype=dtype))
    state, ok = kf_process_update(state, F, Q, B, u)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(state.x), [0.5, 0.0])


def test_nonfinite_rollback():
    """Sanity-check rollback parity (reference kalman-filter.hpp:101-107)."""
    dtype = jnp.float64
    state = kf_init(jnp.zeros(2, dtype=dtype), jnp.eye(2, dtype=dtype))
    F_bad = jnp.full((2, 2), jnp.nan, dtype=dtype)
    Q = jnp.zeros((2, 2), dtype=dtype)
    new_state, ok = kf_process_update(state, F_bad, Q)
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(new_state.x), np.asarray(state.x))
    np.testing.assert_allclose(np.asarray(new_state.P), np.asarray(state.P))


def test_batched_filters(rng):
    """vmap over a bank of independent filters — the batched TPU idiom."""
    import jax

    dtype = jnp.float64
    B = 16
    F = jnp.broadcast_to(jnp.asarray([[1.0, 0.1], [0.0, 1.0]], dtype=dtype), (B, 2, 2))
    Q = jnp.broadcast_to(jnp.eye(2, dtype=dtype) * 1e-6, (B, 2, 2))
    H = jnp.broadcast_to(jnp.asarray([[1.0, 0.0]], dtype=dtype), (B, 1, 2))
    R = jnp.broadcast_to(jnp.asarray([[1e-4]], dtype=dtype), (B, 1, 1))
    z = jnp.asarray(rng.normal(size=(B, 1)), dtype=dtype)

    state = KFState(jnp.zeros((B, 2), dtype=dtype),
                    jnp.broadcast_to(jnp.eye(2, dtype=dtype), (B, 2, 2)))
    proc = jax.vmap(lambda s, f, q: kf_process_update(s, f, q)[0])
    meas = jax.vmap(lambda s, h, zz, r: kf_measurement_update(s, h, zz, r)[0])
    state = proc(state, F, Q)
    state = meas(state, H, z, R)
    assert state.x.shape == (B, 2)
    assert np.all(np.isfinite(np.asarray(state.x)))
