"""In-process sub-stage timing of the per-frame preprocess (ORB + KLT prep).

Times prefix-truncated preprocess pipelines, each as a 5-frame lax.scan
(the same dispatch context as bench replay), 20 passes each — the only
timing methodology that has proven reliable on the tunneled TPU.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mvslam_tpu.io import load_image_grayscale  # noqa: E402
from mvslam_tpu.ops import klt  # noqa: E402
from mvslam_tpu.ops import features as F  # noqa: E402

TSUKUBA = "/root/reference/data/tsukuba"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    p = F.OrbParams()
    images = jnp.stack([
        jax.device_put(load_image_grayscale(f"{TSUKUBA}/{i}.jpg"))
        for i in range(1, 6)
    ])
    H, W = images.shape[1:]
    shapes = F._level_shapes(H, W, p)
    budgets = F._level_budgets(p)

    def stage_fn(stage):
        def per_frame(img):
            if stage == "full+klt":
                fs = F.orb_detect(img, p)
                smooth = klt.smooth_image(img)
                tmpl = klt.extract_templates(smooth, fs.xy)
                return fs.xy.sum() + tmpl.sum()
            acc = []
            level_img = img
            for l in range(p.num_levels):
                h, w = level_img.shape
                if stage != "pyramid":
                    score = F.fast_score(level_img, p.fast_threshold)
                    score = F.nms3x3(score)
                    score = F._suppress_border(score, p.border)
                    if stage == "fast":
                        acc.append(score.sum())
                    else:
                        harris = F.harris_response(level_img, p.harris_k)
                        rank = jnp.where(score > 0, harris, -jnp.inf)
                        if stage == "harris":
                            acc.append(rank.sum())
                        else:
                            vals, idx = jax.lax.top_k(
                                rank.reshape(-1), int(budgets[l]))
                            if stage == "topk":
                                acc.append(vals.sum() + idx.sum())
                            else:
                                ys = (idx // w).astype(img.dtype)
                                xs = (idx % w).astype(img.dtype)
                                xy_int = jnp.stack([xs, ys], -1)
                                patches = F._extract_patches(
                                    level_img, xy_int, F.PATCH_RADIUS + 2)
                                if stage == "patches":
                                    acc.append(patches.sum())
                                else:
                                    angles = F._orientation(patches)
                                    sm = F._box_sum(patches, 2) / 25.0
                                    desc = F._descriptors(sm, angles)
                                    acc.append(desc.sum().astype(img.dtype))
                else:
                    acc.append(level_img.sum())
                if l + 1 < p.num_levels:
                    level_img = jax.image.resize(
                        level_img, shapes[l + 1], "linear")
            out = jnp.stack([a.astype(jnp.float32) for a in acc]).sum()
            if stage == "smooth":
                out = out + klt.smooth_image(img).sum()
            return out

        @jax.jit
        def run(images):
            def body(c, img):
                return c + per_frame(img), 0.0
            return jax.lax.scan(body, jnp.float32(0), images)[0]

        return run

    stages = ["pyramid", "fast", "harris", "topk", "patches", "desc",
              "smooth", "full+klt"]
    prev = 0.0
    for s in stages:
        fn = stage_fn(s)
        t0 = time.time()
        out = fn(images)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        passes = 20
        for _ in range(passes):
            out = fn(images)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / passes / images.shape[0] * 1e3
        log(f"{s:10s} {dt:7.2f} ms/frame (+{dt - prev:6.2f}) "
            f"[compile {compile_s:.0f}s]")
        prev = dt


if __name__ == "__main__":
    main()
