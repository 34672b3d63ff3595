"""Sub-stage timing of orb_detect + KLT preprocess on the real tsukuba frame.

Each candidate stage composition is jitted standalone and timed; per-level
dense work (FAST/NMS/Harris), top_k selection, and the patch/descriptor
gather chain are separated so the optimization target is unambiguous.
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
from mvslam_tpu.ops import klt
from mvslam_tpu.ops import features as F

TSUKUBA = "/root/reference/data/tsukuba"


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1e3
    log(f"{name:28s} {dt:8.3f} ms")
    return dt


def main():
    p = F.OrbParams()
    img = jax.device_put(load_image_grayscale(f"{TSUKUBA}/3.jpg"))
    log(f"image {img.shape} {img.dtype}")

    L = p.num_levels
    inv = 1.0 / p.scale_factor

    def pyramid(img):
        levels = [img]
        for l in range(1, L):
            h, w = levels[-1].shape
            nh = max(int(round(h * inv)), 2 * p.border + 1)
            nw = max(int(round(w * inv)), 2 * p.border + 1)
            levels.append(jax.image.resize(levels[-1], (nh, nw), "linear"))
        return levels

    def dense_all(img):
        out = []
        for lv in pyramid(img):
            s = F.fast_score(lv, p.fast_threshold)
            s = F.nms3x3(s)
            s = F._suppress_border(s, p.border)
            h = F.harris_response(lv, p.harris_k)
            out.append(jnp.where(s > 0, h, -jnp.inf).sum())
        return jnp.stack(out)

    def dense_plus_topk(img):
        raw = np.array([inv ** (2 * l) for l in range(L)])
        budgets = np.maximum((p.max_features * raw / raw.sum()).astype(int), 1)
        budgets[0] += p.max_features - budgets.sum()
        outs = []
        for l, lv in enumerate(pyramid(img)):
            s = F.fast_score(lv, p.fast_threshold)
            s = F.nms3x3(s)
            s = F._suppress_border(s, p.border)
            h = F.harris_response(lv, p.harris_k)
            rank = jnp.where(s > 0, h, -jnp.inf)
            vals, idx = jax.lax.top_k(rank.reshape(-1), int(budgets[l]))
            outs.append(vals.sum() + idx.sum())
        return jnp.stack([o.astype(jnp.float32) for o in outs]).sum()

    timeit("pyramid", jax.jit(lambda x: jnp.stack([lv.sum() for lv in pyramid(x)])), img)
    timeit("pyr+fast only", jax.jit(lambda x: jnp.stack(
        [F.fast_score(lv, p.fast_threshold).sum() for lv in pyramid(x)])), img)
    timeit("pyr+harris only", jax.jit(lambda x: jnp.stack(
        [F.harris_response(lv, p.harris_k).sum() for lv in pyramid(x)])), img)
    timeit("dense all (fast+nms+harris)", jax.jit(dense_all), img)
    timeit("dense+topk", jax.jit(dense_plus_topk), img)
    timeit("orb_detect full", lambda x: F.orb_detect(x, p), img)
    timeit("orb level0 only", lambda x: F.orb_detect(
        x, p._replace(num_levels=1)), img)
    timeit("orb 4 levels", lambda x: F.orb_detect(
        x, p._replace(num_levels=4)), img)

    sm = klt.smooth_image(img)
    feats = F.orb_detect(img, p)
    timeit("smooth_image", klt.smooth_image, img)
    timeit("extract_templates", jax.jit(klt.extract_templates), sm, feats.xy)

    # descriptor chain alone at level 0
    def desc_chain(lv, xy):
        patches = F._extract_patches(lv, xy, F.PATCH_RADIUS + 2)
        angles = F._orientation(patches)
        smooth = jax.vmap(lambda q: F._box_sum(q, 2) / 25.0)(patches)
        return F._descriptors(smooth, angles)

    timeit("desc chain (512 pts, L0)", jax.jit(desc_chain), img,
           feats.xy[:512])


if __name__ == "__main__":
    main()
