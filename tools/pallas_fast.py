"""Pallas A/B: fused FAST+NMS+Harris dense front vs the XLA composition.

SURVEY §7 step 4 / VERDICT r3 item 6: decide the Pallas question with a
measurement. One kernel computes, per pyramid level, the NMS'd
border-suppressed Harris-ranked corner map (the `rank` input of the top-k
stage) in a single VMEM-resident pass: the image level is read from HBM
once and the rank map written once, instead of the XLA composition's
~40 materialized intermediates.

Parity: asserts exact (bitwise-ish, 1e-6) agreement with the XLA path on
the real frame before timing. Timing uses the scan-over-10-perturbed-
images harness (see PERF.md methodology).

Run: python tools/pallas_fast.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops import features as F

TSUKUBA = "/root/reference/data/tsukuba"


def log(m):
    print(m, file=sys.stderr, flush=True)


def xla_rank_maps(img, p):
    shapes = F._level_shapes(*img.shape, p)
    lv = img
    out = []
    for l in range(p.num_levels):
        s = F.fast_score(lv, p.fast_threshold)
        s = F.nms3x3(s)
        s = F._suppress_border(s, p.border)
        h = F.harris_response(lv, p.harris_k)
        out.append(jnp.where(s > 0, h, -jnp.inf))
        if l + 1 < p.num_levels:
            lv = jax.image.resize(lv, shapes[l + 1], "linear")
    return out


def pallas_rank_maps(img, p):
    from mvslam_tpu.ops.features_pallas import fast_nms_harris_rank

    shapes = F._level_shapes(*img.shape, p)
    lv = img
    out = []
    for l in range(p.num_levels):
        out.append(fast_nms_harris_rank(
            lv, p.fast_threshold, p.harris_k, p.border))
        if l + 1 < p.num_levels:
            lv = jax.image.resize(lv, shapes[l + 1], "linear")
    return out


def main():
    p = F.OrbParams()
    img = jax.device_put(load_image_grayscale(f"{TSUKUBA}/3.jpg"))

    # ---- parity ----
    ra = jax.jit(lambda x: xla_rank_maps(x, p))(img)
    rb = jax.jit(lambda x: pallas_rank_maps(x, p))(img)
    for l, (a, b) in enumerate(zip(ra, rb)):
        a = np.asarray(a)
        b = np.asarray(b)
        same_inf = (np.isneginf(a) == np.isneginf(b))
        finite = np.isfinite(a) & np.isfinite(b)
        close = np.abs(a[finite] - b[finite]).max() if finite.any() else 0.0
        log(f"level {l}: corner-set match {same_inf.mean()*100:.3f}%  "
            f"max|harris diff| {close:.2e}  corners {np.isfinite(b).sum()}")
        assert same_inf.mean() > 0.9995, f"level {l} corner sets diverge"
        assert close < 1e-5, f"level {l} harris drift"

    # ---- timing (scan harness) ----
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.stack([
        jnp.asarray(np.asarray(img) + rng.normal(0, 1e-6, img.shape)
                    .astype(np.float32)) for _ in range(10)
    ]))

    def t_scan(name, fn, reps=10):
        @jax.jit
        def run(xs):
            def body(acc, x):
                maps = fn(x, p)
                return acc + sum(m.sum() for m in maps), 0.0
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc
        out = run(imgs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = run(imgs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps / imgs.shape[0] * 1e3
        log(f"{name:28s} {dt:8.3f} ms / frame (8 levels)")
        return dt

    t_x = t_scan("XLA composition", xla_rank_maps)
    t_p = t_scan("Pallas fused", pallas_rank_maps)
    log(f"pallas/xla = {t_p / t_x:.2f}x "
        f"({'PALLAS WINS' if t_p < t_x else 'XLA WINS'})")


if __name__ == "__main__":
    main()
