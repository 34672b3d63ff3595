"""ORB sub-stage timing with FULL outputs (DCE-proof).

profile_pre.py returned scalars and XLA dead-code-eliminated the work —
every stage read ~0.01 ms. Here every stage returns its full arrays,
vmapped over the 5 tsukuba frames, standalone-jitted (the 45.6 ms/pass
'vmapped pre x5' figure from profile_split.py is the baseline composition
in this same regime).
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

    def bench(tag, fn, *args, passes=20):
        fj = jax.jit(fn)
        t0 = time.time()
        out = fj(*args)
        jax.block_until_ready(out)
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(passes):
            out = fj(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / passes * 1e3
        log(f"{tag:26s} {dt:8.2f} ms/pass(5f) [compile {comp:.0f}s]")
        return dt

    def pyr(img):
        levels = [img]
        for l in range(1, p.num_levels):
            levels.append(jax.image.resize(levels[-1], shapes[l], "linear"))
        return levels

    bench("pyramid (8 resizes)", lambda ims: jax.vmap(
        lambda im: tuple(pyr(im)))(ims), images)

    def dense(img):
        out = []
        for lv in pyr(img):
            s = F._suppress_border(
                F.nms3x3(F.fast_score(lv, p.fast_threshold)), p.border)
            h = F.harris_response(lv, p.harris_k)
            out.append(jnp.where(s > 0, h, -jnp.inf))
        return tuple(out)

    bench("+dense (fast+nms+harris)", lambda ims: jax.vmap(dense)(ims),
          images)

    def dense_fast_only(img):
        return tuple(
            F._suppress_border(
                F.nms3x3(F.fast_score(lv, p.fast_threshold)), p.border)
            for lv in pyr(img))

    bench("pyr+fast+nms only", lambda ims: jax.vmap(dense_fast_only)(ims),
          images)

    def topk(img):
        outs = []
        for l, r in enumerate(dense(img)):
            outs.append(jax.lax.top_k(r.reshape(-1), int(budgets[l])))
        return tuple(outs)

    bench("+topk per level", lambda ims: jax.vmap(topk)(ims), images)

    def patches(img):
        outs = []
        for l, (vals, idx) in enumerate(topk(img)):
            w = shapes[l][1]
            xy = jnp.stack([(idx % w).astype(img.dtype),
                            (idx // w).astype(img.dtype)], -1)
            outs.append(F._extract_patches(pyr(img)[l], xy,
                                           F.PATCH_RADIUS + 2))
        return tuple(outs)

    bench("+patch gather", lambda ims: jax.vmap(patches)(ims), images)

    bench("orb_detect full", lambda ims: jax.vmap(
        lambda im: F.orb_detect(im, p))(ims), images)

    bench("smooth+templates(const xy)", lambda ims: jax.vmap(
        lambda im: klt.extract_templates(
            klt.smooth_image(im),
            jnp.stack([jnp.linspace(20, W - 20, 512),
                       jnp.linspace(20, H - 20, 512)], -1).astype(im.dtype))
    )(ims), images)


if __name__ == "__main__":
    main()
