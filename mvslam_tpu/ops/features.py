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
    # Layout of the pyramid compute: per-level unrolled graphs (False) vs
    # one (L, H, W) zero-padded canvas batch (True). Both produce the same
    # features; the canvas trades ~2.6x more (masked) dense FLOPs for ~4x
    # fewer kernels — measured SLOWER on the tunneled v5e (19.5 vs 28
    # frames/s end-to-end), so unrolled is the default; kept for meshes
    # where dispatch dominates.
    batched: bool = False
    # Fused Pallas kernel for the dense corner front (FAST+NMS+Harris+
    # border -> rank map, one VMEM pass per level; ops/features_pallas.py).
    # Measured 0.434 vs 0.506 ms/frame against the XLA composition on the
    # tunneled v5e with 100% corner-set parity (tools/pallas_fast.py) —
    # a real but small win, so it stays opt-in: the compiled kernel is
    # TPU-only, and the default path must run everywhere. Ignored when
    # ``subpixel`` or ``batched`` is set (those need the raw Harris
    # surface / canvas layout).
    pallas_dense: bool = False
    pallas_interpret: bool = False   # Pallas interpreter (CPU tests only)


def _pad_hw(img: Array, pad: int, **kw) -> Array:
    """Pad only the trailing two (H, W) axes of an (..., H, W) array."""
    widths = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, widths, **kw)


def _shift0(img: Array, dx: int, dy: int) -> Array:
    """Image shifted with ZERO fill so output[y, x] = img[y + dy, x + dx]
    (matches ``conv SAME`` zero padding). Batched over leading axes."""
    pad = 1
    p = _pad_hw(img, pad)
    start = (0,) * (img.ndim - 2) + (pad + dy, pad + dx)
    return jax.lax.dynamic_slice(p, start, img.shape)


def sep_filter3(img: Array, kv, kh) -> Array:
    """Separable 3-tap cross-correlation (vertical taps ``kv`` then
    horizontal ``kh``), zero-padded — numerically the ``lax.conv`` SAME
    result, built from shifts + fused elementwise adds instead.

    Rationale: on the tunneled v5e a single-channel 3x3
    ``conv_general_dilated`` over a 288x384 image costs ~1.5 ms (measured;
    the small-image conv path is pathological), while a shift is ~3 us.
    The Sobel pair inside :func:`harris_response` was 8.7 of the 9.4 ms
    dense-pyramid cost; this form removes it.
    """
    a = img * kv[1]
    if kv[0]:
        a = a + kv[0] * _shift0(img, 0, -1)
    if kv[2]:
        a = a + kv[2] * _shift0(img, 0, 1)
    b = a * kh[1]
    if kh[0]:
        b = b + kh[0] * _shift0(a, -1, 0)
    if kh[2]:
        b = b + kh[2] * _shift0(a, 1, 0)
    return b


def _shift2d(img: Array, dx: int, dy: int) -> Array:
    """Image shifted so output[y, x] = img[y + dy, x + dx] (edge-replicated,
    so borders of uniform images never fake a corner). Batched over any
    leading axes."""
    pad = 3
    p = _pad_hw(img, pad, mode="edge")
    start = (0,) * (img.ndim - 2) + (pad + dy, pad + dx)
    return jax.lax.dynamic_slice(p, start, img.shape)


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
    """Keep strict local maxima of a 3x3 neighborhood (batched over any
    leading axes)."""
    H, W = score.shape[-2:]
    p = _pad_hw(score, 1, constant_values=-jnp.inf)
    windows = jnp.stack(
        [
            p[..., 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
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

    p = _pad_hw(img, radius)
    return win(win(p, img.ndim - 2), img.ndim - 1)  # back to img.shape


def _box_sum_shifts(img: Array, radius: int) -> Array:
    """Same-size centered box sum via separable shifted adds (zero fill) —
    identical result to :func:`_box_sum`, but without its cumsum scans.
    Preferred for small patch stacks (the (K, P, P) descriptor smoothing),
    where the cumsum lowering dominates; the full-image Harris box sums
    keep the cumsum form (larger extents, measured fine)."""

    def axis_sum(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        p = jnp.pad(x, pad)
        out = x * 0
        for o in range(2 * radius + 1):
            out = out + jax.lax.slice_in_dim(
                p, o, o + x.shape[axis], axis=axis
            )
        return out

    return axis_sum(axis_sum(img, img.ndim - 2), img.ndim - 1)


def harris_response(img: Array, k: float = 0.04, block_radius: int = 3) -> Array:
    """Harris corner response with Sobel gradients + box-summed tensor
    (ORB's HARRIS_SCORE ranking). Batched over any leading axes.

    Sobel = smooth [1,2,1] (x) diff [-1,0,1] / 8, computed separably from
    zero-padded shifts (``sep_filter3``) — see that docstring for why not
    ``lax.conv`` here."""
    smooth = (0.125, 0.25, 0.125)
    diff = (-1.0, 0.0, 1.0)
    Ix = sep_filter3(img, smooth, diff)
    Iy = sep_filter3(img, diff, smooth)
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
    # scattered per-keypoint sampling as two one-hot contractions instead
    # of take_along_axis: the (K, 512)-index batched gather costs ~2.8 ms
    # on the tunneled v5e (serialized element gathers), while the
    # row-select batched matmul + column mask-reduce runs on the MXU/VPU
    # in ~0.1 ms for K=512, P=35.
    K = patches_smooth.shape[0]
    S = 2 * DESCRIPTOR_BITS
    yi_f = yi.reshape(K, S)                                     # (K, S)
    xi_f = xi.reshape(K, S)
    ar = jnp.arange(P, dtype=jnp.int32)
    y_oh = (yi_f[..., None] == ar).astype(patches_smooth.dtype)  # (K, S, P)
    rows = jnp.einsum("ksy,kyx->ksx", y_oh, patches_smooth)      # (K, S, P)
    x_oh = (xi_f[..., None] == ar).astype(patches_smooth.dtype)
    samples = jnp.sum(rows * x_oh, axis=-1)                      # (K, S)
    samples = samples.reshape(K, DESCRIPTOR_BITS, 2)
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)  # (K, 256)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(
        bits.reshape(bits.shape[0], 8, 32) * weights[None, None, :], axis=-1,
        dtype=jnp.uint32,
    )


def extract_patches_onehot(img: Array, xy: Array, radius: int) -> Array:
    """(K, P, P) patches centered at integer-rounded ``xy`` (edge-padded),
    computed as two one-hot contractions — bit-identical to a vmapped
    ``dynamic_slice`` gather, but it runs on the MXU: K=512 35x35 patches
    cost ~1.1 ms as 512 serialized slices on the tunneled v5e vs ~0.15 ms
    as (K*P, Hp) @ (Hp, Wp) row-select + batched column-select matmuls."""
    P = 2 * radius + 1
    H, W = img.shape
    padded = jnp.pad(img, radius, mode="edge")
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    off = jnp.arange(P, dtype=jnp.int32)
    hh = jnp.arange(H + 2 * radius, dtype=jnp.int32)
    ww = jnp.arange(W + 2 * radius, dtype=jnp.int32)
    row_oh = (
        (y0[:, None, None] + off[None, :, None]) == hh
    ).astype(img.dtype)                                     # (K, P, Hp)
    rows = jnp.einsum("kph,hw->kpw", row_oh, padded)        # (K, P, Wp)
    col_oh = (
        (x0[:, None, None] + off[None, :, None]) == ww
    ).astype(img.dtype)                                     # (K, P, Wp)
    # patches[k, py, px] = sum_w rows[k, py, w] * col_oh[k, px, w]
    return jnp.einsum("kpw,kqw->kpq", rows, col_oh)


def _extract_patches(img: Array, xy: Array, radius: int) -> Array:
    """Gather (2r+1)^2 patches centered at integer xy; border-padded."""
    return extract_patches_onehot(img, xy, radius)


def _extract_patches_lhw(canvas: Array, lev: Array, xy: Array,
                         radius: int) -> Array:
    """Batched patch gather from an (L, H, W) level canvas.

    ``lev``: (K,) level index per keypoint; ``xy``: (K, 2) level-local
    integer positions. One vmapped ``dynamic_slice`` over all K keypoints
    of every level — the single gather kernel replacing L per-level vmaps.
    Patches are zero-padded outside the canvas (keypoints live >= border
    from their level's extent, so in-bounds patches never see padding).
    """
    P = 2 * radius + 1
    padded = _pad_hw(canvas, radius)
    H, W = canvas.shape[-2:]

    def one(l, p):
        x = jnp.clip(jnp.round(p[0]).astype(jnp.int32), 0, W - 1)
        y = jnp.clip(jnp.round(p[1]).astype(jnp.int32), 0, H - 1)
        return jax.lax.dynamic_slice(padded, (l, y, x), (1, P, P))[0]

    return jax.vmap(one)(lev, xy)


def _level_shapes(H: int, W: int, params: OrbParams) -> list[tuple[int, int]]:
    """Static per-level (h, w) of the scale pyramid."""
    shapes = [(H, W)]
    inv = 1.0 / params.scale_factor
    for _ in range(1, params.num_levels):
        h, w = shapes[-1]
        shapes.append((
            max(int(round(h * inv)), 2 * params.border + 1),
            max(int(round(w * inv)), 2 * params.border + 1),
        ))
    return shapes


def _level_budgets(params: OrbParams) -> np.ndarray:
    """Per-level keypoint budgets ~ geometric series (OpenCV allocation)."""
    L = params.num_levels
    inv = 1.0 / params.scale_factor
    raw = np.array([inv ** (2 * l) for l in range(L)])
    budgets = np.maximum(
        (params.max_features * raw / raw.sum()).astype(int), 1
    )
    budgets[0] += params.max_features - budgets.sum()
    return budgets


@partial(jax.jit, static_argnames=("params",))
def orb_detect(img: Array, params: OrbParams = OrbParams()) -> FeatureSet:
    """Detect + describe up to ``params.max_features`` keypoints.

    ``img``: (H, W) float grayscale in [0, 1]. Two equivalent compute
    layouts (``params.batched``); per-level budgets are proportional to
    level area, as in OpenCV ORB (reference cap 500,
    ``vision/visual-feature.cpp:9``).
    """
    if params.batched:
        return _orb_detect_batched(img, params)
    return _orb_detect_unrolled(img, params)


def _orb_detect_unrolled(img: Array, params: OrbParams) -> FeatureSet:
    """Per-level unrolled pyramid: each level's dense work runs at its own
    (static) resolution — least total FLOPs, most kernels."""
    dtype = img.dtype
    H, W = img.shape
    L = params.num_levels
    shapes = _level_shapes(H, W, params)
    budgets = _level_budgets(params)

    all_parts = []
    level_img = img
    for l in range(L):
        h, w = level_img.shape
        k_l = int(budgets[l])
        scale_l = params.scale_factor**l
        if params.pallas_dense and not params.subpixel:
            from mvslam_tpu.ops.features_pallas import fast_nms_harris_rank

            rank = fast_nms_harris_rank(
                level_img, params.fast_threshold, params.harris_k,
                params.border, interpret=params.pallas_interpret,
            )
        else:
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
            nbhd = _extract_patches(harris, xy_int, 1)          # (k_l, 3, 3)
            dx = _parabolic_offset(nbhd[:, 1, 0], nbhd[:, 1, 1], nbhd[:, 1, 2])
            dy = _parabolic_offset(nbhd[:, 0, 1], nbhd[:, 1, 1], nbhd[:, 2, 1])
            xy_level = xy_int + jnp.stack([dx, dy], axis=-1)
        else:
            xy_level = xy_int
        # descriptors sample at the stable integer position; the subpixel
        # coordinate is for geometry only
        patches = _extract_patches(level_img, xy_int, PATCH_RADIUS + 2)
        angles = _orientation(patches)
        smooth = _box_sum_shifts(patches, 2) / 25.0
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
            level_img = jax.image.resize(level_img, shapes[l + 1], "linear")

    out = {
        key: jnp.concatenate([p[key] for p in all_parts])
        for key in all_parts[0]
    }
    return FeatureSet(**out)


def _parabolic_offset(sm: Array, s0: Array, sp: Array) -> Array:
    """1D quadratic-fit subpixel offset, trusted only at true 1D maxima
    (rank maximizes Harris *among FAST corners*, so a plain neighbor can
    be larger — fitting uphill just clamps)."""
    dtype = s0.dtype
    denom = 2.0 * (2.0 * s0 - sm - sp)
    off = (sp - sm) / jnp.where(
        jnp.abs(denom) < jnp.finfo(dtype).eps, 1.0, denom
    )
    is_max = jnp.logical_and(s0 >= sm, s0 >= sp)
    return jnp.where(is_max, jnp.clip(off, -0.5, 0.5), 0.0)


def _orb_detect_batched(img: Array, params: OrbParams) -> FeatureSet:
    """Canvas layout: the pyramid levels are packed top-left into one
    ``(L, H, W)`` batch so the dense work (FAST, NMS, Harris) and the
    per-keypoint work (selection, patch gather, orientation, rBRIEF) each
    run ONCE as a batch — fewest kernels, ~2.6x more (masked) dense FLOPs.
    Canvas regions outside a level's true extent are zero; every consumer
    is masked by the per-level border box (``border`` >= every
    stencil/patch radius, so zeros never leak into surviving keypoints).
    """
    dtype = img.dtype
    H, W = img.shape
    L = params.num_levels
    shapes = _level_shapes(H, W, params)
    budgets = _level_budgets(params)
    k_max = int(budgets.max())

    # ---- pyramid into one (L, H, W) canvas (top-left anchored) ----------
    levels = [img]
    for l in range(1, L):
        levels.append(jax.image.resize(levels[-1], shapes[l], "linear"))
    canvas = jnp.zeros((L, H, W), dtype)
    for l, lv in enumerate(levels):
        canvas = jax.lax.dynamic_update_slice(canvas, lv[None], (l, 0, 0))

    # ---- dense scoring, one batched pass --------------------------------
    score = fast_score(canvas, params.fast_threshold)
    score = nms3x3(score)
    harris = harris_response(canvas, params.harris_k)
    # static in-bounds border mask per level
    bm = np.zeros((L, H, W), bool)
    b = params.border
    for l, (h, w) in enumerate(shapes):
        bm[l, b : h - b, b : w - b] = True
    border_ok = jnp.asarray(bm)
    rank = jnp.where((score > 0) & border_ok, harris, -jnp.inf)

    # ---- batched top-k + static slot maps -------------------------------
    vals_l, idx_l = jax.lax.top_k(rank.reshape(L, -1), k_max)  # (L, k_max)
    slot_level = np.repeat(np.arange(L), budgets)              # (K,)
    slot_rank = np.concatenate([np.arange(n) for n in budgets])
    lev = jnp.asarray(slot_level, jnp.int32)
    rnk = jnp.asarray(slot_rank, jnp.int32)
    vals = vals_l[lev, rnk]                                    # (K,)
    idx = idx_l[lev, rnk]
    ys = (idx // W).astype(dtype)
    xs = (idx % W).astype(dtype)
    valid = jnp.isfinite(vals)
    xy_int = jnp.stack([xs, ys], axis=-1)                      # level-local
    scale = jnp.asarray(
        params.scale_factor ** slot_level.astype(np.float64), dtype
    )

    if params.subpixel:
        # 1D quadratic fits on the Harris surface around each maximum
        nbhd = _extract_patches_lhw(harris, lev, xy_int, 1)    # (K, 3, 3)
        dx = _parabolic_offset(nbhd[:, 1, 0], nbhd[:, 1, 1], nbhd[:, 1, 2])
        dy = _parabolic_offset(nbhd[:, 0, 1], nbhd[:, 1, 1], nbhd[:, 2, 1])
        xy_level = xy_int + jnp.stack([dx, dy], axis=-1)
    else:
        xy_level = xy_int

    # ---- one batched patch gather + orientation + descriptors -----------
    # descriptors sample at the stable integer position; the subpixel
    # coordinate is for geometry only
    patches = _extract_patches_lhw(canvas, lev, xy_int, PATCH_RADIUS + 2)
    angles = _orientation(patches)
    smooth = _box_sum_shifts(patches, 2) / 25.0
    desc = _descriptors(smooth, angles)

    return FeatureSet(
        xy=xy_level * scale[:, None],
        response=jnp.where(valid, vals, -jnp.inf),
        angle=angles,
        octave=jnp.asarray(slot_level, jnp.int32),
        sigma=(2.0 ** jnp.asarray(slot_level, dtype)) * jnp.asarray(0.5, dtype),
        desc=desc,
        mask=valid,
    )
