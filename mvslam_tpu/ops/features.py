"""TPU-native ORB-style feature detection + description.

Rebuild of the reference's OpenCV delegation (``vision/visual-feature.cpp``:
``cv::ORB`` detect/extract, 500 keypoints) as statically-shaped XLA array
programs:

- **FAST-9/16 corners**: the 16-pixel Bresenham circle becomes 16 shifted
  image planes; the "9 contiguous brighter/darker" test is a chain of
  circular-rotated mins (log-depth), giving every pixel's max-margin FAST
  score in one fused elementwise pass — no per-pixel branching.
- **3x3 non-max suppression** via max-pool comparison.
- **Harris re-ranking** of FAST corners (ORB's ``HARRIS_SCORE``): Sobel
  structure tensor, 7x7 box sum, ``det - k tr^2``.
- **Top-K selection** per pyramid level with validity masks — the static
  budget replaces OpenCV's dynamic keypoint vectors (reference cap 500,
  ``visual-feature.cpp:9``; ours defaults to 512).
- **Orientation** by the intensity-centroid moments of a radius-15 disc.
- **rBRIEF descriptors**: 256 coordinate pairs (deterministically generated
  Gaussian pattern, ORB-paper style — OpenCV's learned table is not
  reproduced), rotated per-keypoint, sampled from a 5x5 box-smoothed patch,
  packed to 8 x uint32.

The per-keypoint uncertainty model matches the reference:
``sigma = 2^octave * 0.5`` px (``visual-feature.cpp:192-207``).

All shapes are static per (H, W, K); everything jits and vmaps. The matcher
lives in ``mvslam_tpu.ops.matching``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

#: FAST-9/16 Bresenham circle, circular order (dx, dy)
_FAST_CIRCLE = np.array(
    [
        (3, 0), (3, 1), (2, 2), (1, 3), (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3), (0, -3), (1, -3), (2, -2),
        (3, -1),
    ],
    dtype=np.int32,
)

PATCH_RADIUS = 15            # orientation disc + descriptor patch half-size
DESCRIPTOR_BITS = 256
_PATTERN_SCALE = PATCH_RADIUS / 3.0   # ORB-paper sigma = patch/6 per point


def _brief_pattern() -> np.ndarray:
    """Deterministic rBRIEF sampling pattern: 256 pairs of (x, y) offsets.

    Gaussian-distributed around the patch center (ORB paper, Rublee et al.
    2011, pattern style G(0, S^2/25) clipped to the disc); fixed seed so
    descriptors are stable across processes/hosts.
    """
    rng = np.random.default_rng(0x0B5E55ED)
    pts = rng.normal(0.0, _PATTERN_SCALE, size=(DESCRIPTOR_BITS, 2, 2))
    r = PATCH_RADIUS - 2
    return np.clip(pts, -r, r).astype(np.float32)


_PATTERN = _brief_pattern()   # (256, 2, 2)


class FeatureSet(NamedTuple):
    """Fixed-capacity keypoints + descriptors for one image.

    ``xy``: (K, 2) level-0 pixel coordinates (x, y); ``response``: Harris
    score; ``angle``: radians; ``octave``: pyramid level; ``sigma``: per-
    keypoint isotropic measurement stddev (reference model); ``desc``:
    (K, 8) uint32 packed 256-bit descriptors; ``mask``: validity.
    """

    xy: Array
    response: Array
    angle: Array
    octave: Array
    sigma: Array
    desc: Array
    mask: Array

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]


class OrbParams(NamedTuple):
    max_features: int = 512
    fast_threshold: float = 20.0 / 255.0   # OpenCV default 20 (8-bit)
    harris_k: float = 0.04
    num_levels: int = 8
    scale_factor: float = 1.2
    border: int = PATCH_RADIUS + 4         # keep descriptor patches inside
    # Harris-surface sub-pixel localization. Off by default: integer anchors
    # are deterministic across frames (what keeps pixel-aligned synthetic
    # data like tsukuba noise-free), and geometric accuracy comes from the
    # KLT refinement stage instead (ops/klt.py).
    subpixel: bool = False


def _shift2d(img: Array, dx: int, dy: int) -> Array:
    """Image shifted so output[y, x] = img[y + dy, x + dx] (edge-replicated,
    so borders of uniform images never fake a corner)."""
    H, W = img.shape
    pad = 3
    p = jnp.pad(img, pad, mode="edge")
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (H, W))


def fast_score(img: Array, threshold: float) -> Array:
    """Max-margin FAST-9/16 corner score per pixel (0 = not a corner).

    For each pixel: the best, over the 16 contiguous 9-long arcs, of the
    worst margin within the arc — where margin is ``ring - center - t``
    (bright) or ``center - ring - t`` (dark). Computed for all pixels at
    once with circular-rotation min-chains.
    """
    center = img
    ring = jnp.stack(
        [_shift2d(img, int(dx), int(dy)) for dx, dy in _FAST_CIRCLE]
    )                                                   # (16, H, W)
    bright = ring - center[None] - threshold
    dark = center[None] - ring - threshold

    def arc9_min(m):
        # min over each circular window of 9 consecutive entries
        m2 = jnp.minimum(m, jnp.roll(m, -1, axis=0))
        m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
        m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
        m9 = jnp.minimum(m8, jnp.roll(m, -8, axis=0))
        return m9                                       # (16, H, W)

    score = jnp.maximum(
        jnp.max(arc9_min(bright), axis=0), jnp.max(arc9_min(dark), axis=0)
    )
    return jnp.maximum(score, 0.0)


def nms3x3(score: Array) -> Array:
    """Keep strict local maxima of a 3x3 neighborhood."""
    p = jnp.pad(score, 1, constant_values=-jnp.inf)
    windows = jnp.stack(
        [
            p[1 + dy : 1 + dy + score.shape[0], 1 + dx : 1 + dx + score.shape[1]]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    return jnp.where(score >= jnp.max(windows, axis=0), score, 0.0)


def _box_sum(img: Array, radius: int) -> Array:
    """Same-size centered (2r+1)^2 box filter via separable
    cumsum-difference passes (zero padding outside)."""
    k = 2 * radius + 1

    def win(x, axis):
        c = jnp.cumsum(x, axis=axis)
        zshape = list(x.shape)
        zshape[axis] = 1
        c = jnp.concatenate([jnp.zeros(zshape, x.dtype), c], axis=axis)
        hi = jax.lax.slice_in_dim(c, k, c.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, c.shape[axis] - k, axis=axis)
        return hi - lo                      # size n - k + 1 along axis

    p = jnp.pad(img, radius)
    return win(win(p, 0), 1)                # back to img.shape


def harris_response(img: Array, k: float = 0.04, block_radius: int = 3) -> Array:
    """Harris corner response with Sobel gradients + box-summed tensor
    (ORB's HARRIS_SCORE ranking)."""
    sob_x = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], img.dtype) / 8.0
    sob_y = sob_x.T

    def conv3(x, kern):
        return jax.lax.conv_general_dilated(
            x[None, None], kern[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    Ix = conv3(img, sob_x)
    Iy = conv3(img, sob_y)
    Sxx = _box_sum(Ix * Ix, block_radius)
    Syy = _box_sum(Iy * Iy, block_radius)
    Sxy = _box_sum(Ix * Iy, block_radius)
    det = Sxx * Syy - Sxy * Sxy
    tr = Sxx + Syy
    return det - k * tr * tr


def _suppress_border(score: Array, border: int) -> Array:
    H, W = score.shape
    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    ok = (
        (y >= border) & (y < H - border) & (x >= border) & (x < W - border)
    )
    return jnp.where(ok, score, 0.0)


def _orientation(patches: Array) -> Array:
    """Intensity-centroid angle per patch (K, P, P) -> (K,), radians.

    Moments over the radius-15 disc (ORB orientation, Rublee et al. 2011).
    """
    P = patches.shape[-1]
    c = (P - 1) / 2.0
    yy = jnp.arange(P, dtype=patches.dtype)[:, None] - c
    xx = jnp.arange(P, dtype=patches.dtype)[None, :] - c
    disc = ((yy**2 + xx**2) <= PATCH_RADIUS**2).astype(patches.dtype)
    m10 = jnp.sum(patches * (xx * disc)[None], axis=(-2, -1))
    m01 = jnp.sum(patches * (yy * disc)[None], axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _descriptors(patches_smooth: Array, angles: Array) -> Array:
    """Rotated-BRIEF bits from smoothed patches.

    patches_smooth: (K, P, P); angles: (K,). Returns (K, 8) uint32.
    """
    P = patches_smooth.shape[-1]
    c = (P - 1) / 2.0
    pat = jnp.asarray(_PATTERN, patches_smooth.dtype)     # (256, 2, 2)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    # rotate pattern points: (K, 256, 2, 2)
    x = pat[None, ..., 0]
    y = pat[None, ..., 1]
    xr = cos[:, None, None] * x - sin[:, None, None] * y
    yr = sin[:, None, None] * x + cos[:, None, None] * y
    xi = jnp.clip(jnp.round(xr + c), 0, P - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(yr + c), 0, P - 1).astype(jnp.int32)
    flat = patches_smooth.reshape(patches_smooth.shape[0], -1)   # (K, P*P)
    idx = yi * P + xi                                            # (K, 256, 2)
    samples = jnp.take_along_axis(flat[:, :], idx.reshape(idx.shape[0], -1), axis=1)
    samples = samples.reshape(idx.shape)                          # (K, 256, 2)
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)  # (K, 256)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(
        bits.reshape(bits.shape[0], 8, 32) * weights[None, None, :], axis=-1,
        dtype=jnp.uint32,
    )


def _extract_patches(img: Array, xy: Array, radius: int) -> Array:
    """Gather (2r+1)^2 patches centered at integer xy; border-padded."""
    P = 2 * radius + 1
    padded = jnp.pad(img, radius, mode="edge")

    def one(p):
        x = jnp.clip(jnp.round(p[0]).astype(jnp.int32), 0, img.shape[1] - 1)
        y = jnp.clip(jnp.round(p[1]).astype(jnp.int32), 0, img.shape[0] - 1)
        return jax.lax.dynamic_slice(padded, (y, x), (P, P))

    return jax.vmap(one)(xy)


@partial(jax.jit, static_argnames=("params",))
def orb_detect(img: Array, params: OrbParams = OrbParams()) -> FeatureSet:
    """Detect + describe up to ``params.max_features`` keypoints.

    ``img``: (H, W) float grayscale in [0, 1]. Pyramid levels are unrolled
    at trace time (static shapes per level); per-level budgets are
    proportional to level area, as in OpenCV ORB.
    """
    dtype = img.dtype
    H, W = img.shape
    L = params.num_levels
    inv = 1.0 / params.scale_factor
    # per-level budgets ~ geometric series, matching OpenCV's allocation
    raw = np.array([inv ** (2 * l) for l in range(L)])
    budgets = np.maximum(
        (params.max_features * raw / raw.sum()).astype(int), 1
    )
    budgets[0] += params.max_features - budgets.sum()

    all_parts = []
    level_img = img
    for l in range(L):
        h, w = level_img.shape
        k_l = int(budgets[l])
        scale_l = params.scale_factor**l
        score = fast_score(level_img, params.fast_threshold)
        score = nms3x3(score)
        score = _suppress_border(score, params.border)
        harris = harris_response(level_img, params.harris_k)
        rank = jnp.where(score > 0, harris, -jnp.inf)
        vals, idx = jax.lax.top_k(rank.reshape(-1), k_l)
        ys = (idx // w).astype(dtype)
        xs = (idx % w).astype(dtype)
        valid = jnp.isfinite(vals)
        xy_int = jnp.stack([xs, ys], axis=-1)
        if params.subpixel:
            # 1D quadratic fits on the Harris surface around each maximum
            nbhd = _extract_patches(harris, xy_int, 1)          # (k_l, 3, 3)

            def parab(sm, s0, sp):
                # trust the fit only where the center is a true 1D maximum
                # (rank maximizes Harris *among FAST corners*, so a plain
                # neighbor can be larger — fitting uphill just clamps)
                denom = 2.0 * (2.0 * s0 - sm - sp)
                off = (sp - sm) / jnp.where(
                    jnp.abs(denom) < jnp.finfo(dtype).eps, 1.0, denom
                )
                is_max = jnp.logical_and(s0 >= sm, s0 >= sp)
                return jnp.where(is_max, jnp.clip(off, -0.5, 0.5), 0.0)

            dx = parab(nbhd[:, 1, 0], nbhd[:, 1, 1], nbhd[:, 1, 2])
            dy = parab(nbhd[:, 0, 1], nbhd[:, 1, 1], nbhd[:, 2, 1])
            xy_level = xy_int + jnp.stack([dx, dy], axis=-1)
        else:
            xy_level = xy_int
        # descriptors sample at the stable integer position; the subpixel
        # coordinate is for geometry only
        patches = _extract_patches(level_img, xy_int, PATCH_RADIUS + 2)
        angles = _orientation(patches)
        smooth = jax.vmap(lambda p: _box_sum(p, 2) / 25.0)(patches)
        desc = _descriptors(smooth, angles)
        all_parts.append(
            dict(
                xy=xy_level * scale_l,
                response=jnp.where(valid, vals, -jnp.inf),
                angle=angles,
                octave=jnp.full((k_l,), l, jnp.int32),
                sigma=jnp.full((k_l,), (2.0**l) * 0.5, dtype),
                desc=desc,
                mask=valid,
            )
        )
        if l + 1 < L:
            nh = max(int(round(h * inv)), 2 * params.border + 1)
            nw = max(int(round(w * inv)), 2 * params.border + 1)
            level_img = jax.image.resize(level_img, (nh, nw), "linear")

    out = {
        key: jnp.concatenate([p[key] for p in all_parts])
        for key in all_parts[0]
    }
    return FeatureSet(**out)
