"""Signal processing: first-order IIR low-pass filter.

Reference ``source/math/signal-processing.hpp:7-35``: ``y += alpha * (x - y)``.
Offered both as a single-step update and as a scan over a sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def lpf_update(y: Array, x: Array, alpha: float) -> Array:
    """One low-pass filter step."""
    return y + alpha * (x - y)


def lpf_scan(y0: Array, xs: Array, alpha: float) -> Array:
    """Filter a whole sequence (leading axis = time) with ``lax.scan``."""

    def step(y, x):
        y = lpf_update(y, x, alpha)
        return y, y

    _, ys = jax.lax.scan(step, y0, xs)
    return ys


def constrain(x: Array, lo, hi) -> Array:
    """Clamp (reference ``math/utility.hpp:14-24``)."""
    return jnp.clip(x, lo, hi)


def sqr(x):
    """Square (reference ``math/utility.hpp:8-12``)."""
    return x * x
