"""LPF tests — parity oracle: reference ``test/test-signal-processing.cpp``
(hand-computed first-order low-pass sequence)."""

import jax.numpy as jnp
import numpy as np

from mvslam_tpu.math.signal import constrain, lpf_scan, lpf_update, sqr


def test_lpf_hand_computed():
    # y_{k+1} = y_k + alpha (x_k - y_k), y0 = 0, alpha = 0.5, x = 1
    alpha = 0.5
    y = jnp.asarray(0.0, dtype=jnp.float64)
    expected = [0.5, 0.75, 0.875, 0.9375]
    for e in expected:
        y = lpf_update(y, 1.0, alpha)
        assert abs(float(y) - e) < 1e-12


def test_lpf_scan_matches_loop(rng):
    alpha = 0.3
    xs = jnp.asarray(rng.normal(size=50), dtype=jnp.float64)
    ys = lpf_scan(jnp.asarray(0.0, dtype=jnp.float64), xs, alpha)
    y = 0.0
    for i, x in enumerate(np.asarray(xs)):
        y = y + alpha * (x - y)
        assert abs(float(ys[i]) - y) < 1e-12


def test_utility():
    assert float(sqr(jnp.asarray(3.0))) == 9.0
    assert float(constrain(jnp.asarray(5.0), 0.0, 1.0)) == 1.0
    assert float(constrain(jnp.asarray(-5.0), 0.0, 1.0)) == 0.0
    assert float(constrain(jnp.asarray(0.5), 0.0, 1.0)) == 0.5
