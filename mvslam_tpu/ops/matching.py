"""Descriptor matching: brute-force Hamming kNN as an MXU matmul.

Rebuild of the reference's ``cv::BFMatcher(NORM_HAMMING)`` kNN(k=2) + Lowe
ratio 0.7 + max-distance cut (``vision/visual-feature.cpp:51-119``).

The TPU trick: for 256-bit descriptors ``a``, ``b`` with bit vectors
``s = 2 bit - 1 in {-1, +1}``, ``hamming(a, b) = (256 - s_a . s_b) / 2``.
So the whole K x K distance matrix is ONE int8 256-contraction matmul on
the MXU (``preferred_element_type=int32``) instead of K^2 XOR+popcount
loops — this is the speed-of-light formulation for this hardware.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

BITS = 256
LOWE_RATIO = 0.7              # reference visual-feature.cpp:64-70
INVALID_DIST = BITS + 1


class MatchResult(NamedTuple):
    """Per-query best matches. All arrays length K1 (query capacity).

    ``idx``: best-match index into the train set; ``dist``: its Hamming
    distance; ``mask``: passed validity + ratio + distance gates.
    """

    idx: Array
    dist: Array
    mask: Array
    second_dist: Array


def unpack_pm1(desc: Array) -> Array:
    """(K, 8) uint32 packed bits -> (K, 256) int8 in {-1, +1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], BITS)
    return (2 * bits.astype(jnp.int8) - 1).astype(jnp.int8)


def hamming_matrix(desc1: Array, desc2: Array) -> Array:
    """All-pairs Hamming distances (K1, K2) int32 via int8 MXU matmul."""
    s1 = unpack_pm1(desc1)
    s2 = unpack_pm1(desc2)
    dots = jax.lax.dot_general(
        s1, s2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (BITS - dots) // 2


def match_features(
    desc1: Array,
    mask1: Array,
    desc2: Array,
    mask2: Array,
    max_distance: int | None = None,
    ratio: float = LOWE_RATIO,
    cross_check: bool = False,
) -> MatchResult:
    """kNN(2) + Lowe ratio matching of query set 1 against train set 2.

    Reference ``match_visual_features`` (``visual-feature.cpp:51-80``):
    keep a match when ``d1 < ratio * d2`` and (optionally)
    ``d1 <= max_distance``. ``cross_check`` additionally requires query i
    to be train j's best match (not in the reference; off by default).
    """
    D = hamming_matrix(desc1, desc2)
    D = jnp.where(mask2[None, :], D, INVALID_DIST)
    # two smallest distances per query row
    neg_top2, idx_top2 = jax.lax.top_k(-D, 2)
    d1 = -neg_top2[:, 0]
    d2 = -neg_top2[:, 1]
    best = idx_top2[:, 0]
    ok = jnp.logical_and(mask1, d1 < ratio * d2)
    ok = jnp.logical_and(ok, d1 <= BITS)          # at least one valid train
    if max_distance is not None:
        ok = jnp.logical_and(ok, d1 <= max_distance)
    if cross_check:
        back = jnp.argmin(
            jnp.where(mask1[:, None], D, INVALID_DIST), axis=0
        )                                          # best query per train col
        ok = jnp.logical_and(ok, back[best] == jnp.arange(D.shape[0]))
    return MatchResult(idx=best, dist=d1, mask=ok, second_dist=d2)


def gather_matched(
    match: MatchResult, xy1: Array, xy2: Array
) -> tuple[Array, Array, Array]:
    """Aligned coordinate arrays for matched pairs.

    Returns (p1 (K, 2), p2 (K, 2), mask (K,)) — row i pairs query i with its
    best train keypoint; masked rows are arbitrary. The aligned-set shape of
    the reference's ``match_and_filter_visual_features``
    (``visual-feature.cpp:93-119``) without its copy bug (it pushes both
    descriptors into ``filtered1``, ``:113-115``).
    """
    return xy1, xy2[match.idx], match.mask
