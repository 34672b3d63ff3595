"""Batched Lucas-Kanade (KLT) sub-pixel correspondence refinement.

No reference equivalent — the reference's accuracy rests on OpenCV ORB's
keypoint consistency; ours comes from refining every matched position
against a stored template patch with inverse-compositional LK. This is the
component that takes effective measurement noise from ~0.4 px (integer
corner detection) to the ~0.1 px regime the tsukuba ATE bound
(``test/test-visual-odometer.cpp:62,98-102``) demands.

TPU shape: element-wise gathers are poison on TPU (the first version spent
~46 ms/frame in four (N, W, W) scalar gathers per sample), so sampling is
restructured into two stages that the hardware likes:

1. one **block gather**: a (P, P) integer-anchored local patch per keypoint
   via vmapped ``dynamic_slice`` — N contiguous tiles instead of N*W*W
   scattered elements, done once per track;
2. per iteration, **bilinear sampling as matmuls**: the fractional 13x13
   window inside the local patch is ``S_row @ local @ S_col^T`` where
   S_row/S_col are (W, P) two-tap interpolation matrices — batched einsums
   that run on the MXU, with zero gathers inside the loop.

Inverse-compositional LK, translation-only: the 2x2 Hessian comes from
template gradients (computed once); fixed iteration count, jit-safe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

WINDOW = 13          # patch side (odd)
ITERATIONS = 10
MAX_SHIFT = 4.0      # reject tracks that wander farther than this (px)
#: local-patch halfwidth: window radius + max excursion + bilinear margin
_LOCAL_HW = WINDOW // 2 + int(MAX_SHIFT) + 2
_LOCAL_P = 2 * _LOCAL_HW + 1
#: max offset from the anchor while iterating (keeps sampling inside the
#: local patch: hw - r - 1 >= MAX_SHIFT + init rounding slack)
_MAX_OFF = float(_LOCAL_HW - WINDOW // 2 - 1)


class KltResult(NamedTuple):
    xy: Array          # (N, 2) refined positions
    valid: Array       # (N,) convergence + bounds check
    residual: Array    # (N,) mean abs photometric error


@partial(jax.jit, static_argnames=("passes",))
def smooth_image(img: Array, passes: int = 3) -> Array:
    """Separable binomial ([1,2,1]/4) smoothing, ``passes`` times.

    LK with bilinear sampling has a fractional-position-dependent bias on
    sharp/aliased imagery (interpolation acts as a varying low-pass);
    tracking on a pre-smoothed copy removes most of it. Templates and the
    tracked image must use the SAME smoothing.
    """
    # shift-based separable taps (NOT lax.conv: the small-image conv path
    # costs ~0.5 ms/call on the tunneled v5e — see features.sep_filter3)
    from mvslam_tpu.ops.features import sep_filter3

    k = (0.25, 0.5, 0.25)
    x = img
    for _ in range(passes):
        x = sep_filter3(x, k, k)
    return x


def _local_patches(img: Array, xy: Array):
    """(N, P, P) integer-anchored local patches + float anchors (N, 2).

    One-hot matmul patch gather (``features.extract_patches_onehot``) —
    the per-keypoint ``dynamic_slice`` form serializes ~N slices on the
    tunneled v5e; the MXU row/column-select form is ~7x faster and
    bit-identical.
    """
    from mvslam_tpu.ops.features import extract_patches_onehot

    H, W_img = img.shape
    ax = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W_img - 1)
    ay = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    local = extract_patches_onehot(img, xy, _LOCAL_HW)
    anchor = jnp.stack([ax, ay], axis=-1).astype(img.dtype)
    return local, anchor


def _interp_matrix(rel: Array, window: int, dtype) -> Array:
    """(N, window, P) two-tap bilinear selection matrices.

    Row i selects position ``rel + (i - r)`` (fractional) from a length-P
    axis: weight ``1-f`` at ``floor`` and ``f`` at ``floor + 1``.
    """
    r = window // 2
    pos = rel[:, None] + jnp.arange(
        -r, r + 1, dtype=dtype
    )[None, :]                                        # (N, window)
    p0 = jnp.floor(pos)
    f = pos - p0
    p0i = jnp.clip(p0.astype(jnp.int32), 0, _LOCAL_P - 2)
    grid = jnp.arange(_LOCAL_P, dtype=jnp.int32)      # (P,)
    is0 = (grid[None, None, :] == p0i[:, :, None]).astype(dtype)
    is1 = (grid[None, None, :] == (p0i + 1)[:, :, None]).astype(dtype)
    return is0 * (1.0 - f)[:, :, None] + is1 * f[:, :, None]


def _bilinear_from_local(local: Array, rel_xy: Array, window: int) -> Array:
    """Fractional (N, window, window) windows out of (N, P, P) local patches
    — two batched matmuls (MXU), no gathers."""
    dtype = local.dtype
    Sx = _interp_matrix(rel_xy[:, 0], window, dtype)   # (N, win, P) cols
    Sy = _interp_matrix(rel_xy[:, 1], window, dtype)   # (N, win, P) rows
    tmp = jnp.einsum("nip,npq->niq", Sy, local)        # rows selected
    return jnp.einsum("niq,njq->nij", tmp, Sx)         # cols selected


def extract_templates(img: Array, xy: Array, window: int = WINDOW) -> Array:
    """Template patches (N, W, W), bilinear at fractional ``xy``."""
    local, anchor = _local_patches(img, xy)
    rel = xy.astype(img.dtype) - anchor + _LOCAL_HW
    return _bilinear_from_local(local, rel, window)


@partial(jax.jit, static_argnames=("window", "iterations"))
def klt_track(
    templates: Array,
    img: Array,
    xy_init: Array,
    mask: Array,
    window: int = WINDOW,
    iterations: int = ITERATIONS,
) -> KltResult:
    """Refine positions in ``img`` so the local patch matches ``templates``.

    Invalid/diverged tracks return their initial position with
    ``valid=False``.
    """
    dtype = img.dtype
    # template gradients (central differences on the interior)
    tx = 0.5 * (
        jnp.pad(templates, ((0, 0), (0, 0), (0, 1)), mode="edge")[:, :, 1:]
        - jnp.pad(templates, ((0, 0), (0, 0), (1, 0)), mode="edge")[:, :, :-1]
    )
    ty = 0.5 * (
        jnp.pad(templates, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:, :]
        - jnp.pad(templates, ((0, 0), (1, 0), (0, 0)), mode="edge")[:, :-1, :]
    )
    Hxx = jnp.sum(tx * tx, axis=(-2, -1))
    Hxy = jnp.sum(tx * ty, axis=(-2, -1))
    Hyy = jnp.sum(ty * ty, axis=(-2, -1))
    det = Hxx * Hyy - Hxy * Hxy
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    good_H = det > tiny
    inv_det = 1.0 / jnp.where(good_H, det, 1.0)

    local, anchor = _local_patches(img, xy_init)

    def sample(xy):
        rel = xy - anchor + _LOCAL_HW
        return _bilinear_from_local(local, rel, window)

    def step(_, xy):
        cur = sample(xy)
        e = cur - templates
        bx = jnp.sum(tx * e, axis=(-2, -1))
        by = jnp.sum(ty * e, axis=(-2, -1))
        # delta = H^-1 b ; inverse-compositional update is p <- p - delta
        dx = (Hyy * bx - Hxy * by) * inv_det
        dy = (Hxx * by - Hxy * bx) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)
        delta = jnp.clip(delta, -1.5, 1.5)
        upd = jnp.where((mask & good_H)[:, None], delta, 0.0)
        new = xy - upd
        # stay inside the local patch (diverged tracks fail MAX_SHIFT below)
        return anchor + jnp.clip(new - anchor, -_MAX_OFF, _MAX_OFF)

    xy = jax.lax.fori_loop(0, iterations, step, xy_init.astype(dtype))
    shift = jnp.linalg.norm(xy - xy_init, axis=-1)
    cur = sample(xy)
    residual = jnp.mean(jnp.abs(cur - templates), axis=(-2, -1))
    valid = mask & good_H & (shift <= MAX_SHIFT) & jnp.all(
        jnp.isfinite(xy), axis=-1
    )
    xy_out = jnp.where(valid[:, None], xy, xy_init)
    return KltResult(xy=xy_out, valid=valid, residual=residual)
