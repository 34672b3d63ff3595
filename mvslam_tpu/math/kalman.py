"""Batched linear Kalman filter.

Functional rebuild of the reference's templated ``KalmanFilter<N>``
(``source/math/kalman-filter.hpp:9-232``): process update with or without a
control input, measurement update with an explicit ``S^{-1}`` gain, and the
reference's sanity check that rolls the state back when an update produces
non-finite values (``kalman-filter.hpp:101-107,194-200``).

State is a pytree; every op is jit/vmap-safe and batched over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class KFState(NamedTuple):
    x: Array  # (..., N) state mean
    P: Array  # (..., N, N) state covariance


def kf_init(x0: Array, P0: Array) -> KFState:
    return KFState(jnp.asarray(x0), jnp.asarray(P0))


def _all_finite(*arrays: Array) -> Array:
    ok = None
    for a in arrays:
        f = jnp.all(jnp.isfinite(a), axis=tuple(range(a.ndim)))
        ok = f if ok is None else jnp.logical_and(ok, f)
    return ok


def _rollback(new: KFState, old: KFState) -> tuple[KFState, Array]:
    """Keep ``new`` only if it is entirely finite, else keep ``old``.

    Mirrors ``check_state_covar_sanity`` + rollback in the reference.
    """
    ok = jnp.logical_and(jnp.all(jnp.isfinite(new.x)), jnp.all(jnp.isfinite(new.P)))
    x = jnp.where(ok, new.x, old.x)
    P = jnp.where(ok, new.P, old.P)
    return KFState(x, P), ok


def kf_process_update(
    state: KFState,
    F: Array,
    Q: Array,
    B: Optional[Array] = None,
    u: Optional[Array] = None,
) -> tuple[KFState, Array]:
    """x' = F x (+ B u); P' = F P F^T + Q. Returns (state, ok)."""
    x = jnp.einsum("...ij,...j->...i", F, state.x)
    if B is not None and u is not None:
        x = x + jnp.einsum("...ij,...j->...i", B, u)
    P = F @ state.P @ jnp.swapaxes(F, -1, -2) + Q
    return _rollback(KFState(x, P), state)


def kf_measurement_update(
    state: KFState, H: Array, z: Array, R: Array
) -> tuple[KFState, Array]:
    """Standard KF measurement update with explicit innovation-covariance
    inverse gain ``K = P H^T S^{-1}`` (reference ``kalman-filter.hpp:166-205``)."""
    Ht = jnp.swapaxes(H, -1, -2)
    y = z - jnp.einsum("...ij,...j->...i", H, state.x)
    S = H @ state.P @ Ht + R
    K = state.P @ Ht @ jnp.linalg.inv(S)
    x = state.x + jnp.einsum("...ij,...j->...i", K, y)
    n = state.P.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=state.P.dtype), state.P.shape)
    P = (eye - K @ H) @ state.P
    return _rollback(KFState(x, P), state)
