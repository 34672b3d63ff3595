"""Fused Pallas kernel for the dense ORB corner front.

One VMEM-resident pass per pyramid level computing the NMS'd,
border-suppressed, Harris-ranked FAST corner map — the `rank` input of the
top-k stage in ``features.orb_detect``. The XLA composition materializes
~40 (H, W) intermediates through HBM; here the level is read once and the
rank map written once (SURVEY §7 step 4's prescribed experiment; A/B
driver in ``tools/pallas_fast.py``).

Layout: grid over row STRIPES of ``_STRIPE`` output rows; each program
slices a (stripe + 2*HALO)-row slab from the full VMEM-resident padded
level, runs the whole chain on slab-sized temporaries (bounding live VMEM
to a few MB — a single whole-image program OOM'd scoped vmem at level 0),
and writes one output stripe. Shifts inside the slab are plain rolls: the
HALO=4 margin covers the chain's total reach (FAST ring 3 + NMS 1;
Sobel 1 + box 3), so roll wrap-around never contaminates an output row.

Parity with ``features.fast_score`` / ``nms3x3`` / ``harris_response`` /
``_suppress_border``: corner sets are bit-exact away from the image
border; the boundary-fill semantics (edge vs zero vs -inf) differ only
within 8 px of the true image edge, entirely inside the ``border`` (>= 19)
suppression band, so the emitted rank maps agree everywhere. Harris
summation order differs from the cumsum ``_box_sum`` (f32 drift ~1e-6 on
the ranking surface only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvslam_tpu.ops.features import _FAST_CIRCLE

Array = jax.Array

_HALO = 4
_STRIPE = 64


def _roll2(x: Array, dx: int, dy: int) -> Array:
    """out[y, x] = in[y+dy, x+dx] with wrap (valid only HALO-deep)."""
    r = x
    if dy:
        r = jnp.roll(r, -dy, axis=0)   # guarded: roll-by-0 lowers to a
    if dx:                             # zero-size slice in Mosaic
        r = jnp.roll(r, -dx, axis=1)
    return r


def _make_kernel(h: int, w: int, stripe: int,
                 threshold: float, k: float, border: int):
    pad = _HALO
    rows_slab = stripe + 2 * pad

    def kernel(img_ref, out_ref):
        i = pl.program_id(0)
        base = i * stripe
        slab = img_ref[pl.ds(base, rows_slab), :]     # (rows_slab, w+2p)

        # ---- FAST-9/16 max-margin score ----
        ring = [_roll2(slab, int(dx), int(dy)) for dx, dy in _FAST_CIRCLE]
        bright = [r - slab - threshold for r in ring]
        dark = [slab - r - threshold for r in ring]

        def arc9(vals):
            m2 = [jnp.minimum(vals[i_], vals[(i_ + 1) % 16])
                  for i_ in range(16)]
            m4 = [jnp.minimum(m2[i_], m2[(i_ + 2) % 16]) for i_ in range(16)]
            m8 = [jnp.minimum(m4[i_], m4[(i_ + 4) % 16]) for i_ in range(16)]
            return [jnp.minimum(m8[i_], vals[(i_ + 8) % 16])
                    for i_ in range(16)]

        mb = arc9(bright)
        md = arc9(dark)
        score = mb[0]
        for m in mb[1:] + md:
            score = jnp.maximum(score, m)
        score = jnp.maximum(score, 0.0)

        # ---- 3x3 strict NMS ----
        nbr = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                s = _roll2(score, dx, dy)
                nbr = s if nbr is None else jnp.maximum(nbr, s)
        score = jnp.where(score >= nbr, score, 0.0)

        # ---- Harris (separable Sobel + 7x7 box sums) ----
        def sep3(x, kv, kh):
            a = x * kv[1]
            if kv[0]:
                a = a + kv[0] * _roll2(x, 0, -1)
            if kv[2]:
                a = a + kv[2] * _roll2(x, 0, 1)
            b = a * kh[1]
            if kh[0]:
                b = b + kh[0] * _roll2(a, -1, 0)
            if kh[2]:
                b = b + kh[2] * _roll2(a, 1, 0)
            return b

        smooth = (0.125, 0.25, 0.125)
        diff = (-1.0, 0.0, 1.0)
        Ix = sep3(slab, smooth, diff)
        Iy = sep3(slab, diff, smooth)

        def box7(x):
            ay = x
            for o in (-3, -2, -1, 1, 2, 3):
                ay = ay + _roll2(x, 0, o)
            ax = ay
            for o in (-3, -2, -1, 1, 2, 3):
                ax = ax + _roll2(ay, o, 0)
            return ax

        Sxx = box7(Ix * Ix)
        Syy = box7(Iy * Iy)
        Sxy = box7(Ix * Iy)
        harris = Sxx * Syy - Sxy * Sxy - k * (Sxx + Syy) ** 2

        # ---- harvest output stripe + border suppression ----
        sc = score[pad:pad + stripe, pad:pad + w]
        hr = harris[pad:pad + stripe, pad:pad + w]
        rows_g = base + jax.lax.broadcasted_iota(
            jnp.int32, (stripe, w), 0)
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (stripe, w), 1)
        inb = ((rows_g >= border) & (rows_g < h - border)
               & (cols_g >= border) & (cols_g < w - border))
        out_ref[:] = jnp.where((sc > 0) & inb, hr,
                               jnp.float32(-jnp.inf))

    return kernel


@partial(jax.jit, static_argnames=("threshold", "k", "border", "interpret"))
def fast_nms_harris_rank(img: Array, threshold: float, k: float,
                         border: int, interpret: bool = False) -> Array:
    """Rank map for one pyramid level — the fused form of
    ``where(suppress(nms(fast(img))) > 0, harris(img), -inf)``.

    ``interpret=True`` runs the Pallas interpreter (CPU tests; the
    compiled kernel is TPU-only)."""
    if img.dtype != jnp.float32:
        # the kernel fills with jnp.float32(-inf) and out_shape uses
        # img.dtype; anything but f32 would silently cast inside the kernel
        raise TypeError(f"fast_nms_harris_rank is f32-only, got {img.dtype}")
    h, w = img.shape
    stripe = min(_STRIPE, max(8, h))
    n_stripes = -(-h // stripe)
    hp = n_stripes * stripe
    padded = jnp.pad(img, _HALO, mode="edge")
    if hp > h:
        padded = jnp.pad(padded, ((0, hp - h), (0, 0)), mode="edge")
    out = pl.pallas_call(
        _make_kernel(h, w, stripe, float(threshold), float(k), int(border)),
        grid=(n_stripes,),
        out_shape=jax.ShapeDtypeStruct((hp, w), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((stripe, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    return out[:h]
