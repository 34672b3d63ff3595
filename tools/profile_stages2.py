"""Per-stage on-device timing of the fused VO step's components."""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.frontend.vo_jit import VoJitParams
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import klt, matching, ransac, sfm
from mvslam_tpu.ops.features import orb_detect

TSUKUBA = "/root/reference/data/tsukuba"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    log(f"{name:28s} {(time.time()-t0)/reps*1e3:8.2f} ms")
    return out


def main():
    log(f"devices: {jax.devices()}")
    p = VoJitParams()
    img = jax.device_put(load_image_grayscale(f"{TSUKUBA}/1.jpg"))
    K = p.orb.max_features

    f1 = bench("orb_detect", jax.jit(lambda im: orb_detect(im, p.orb)), img)
    smooth = bench("klt.smooth_image", jax.jit(klt.smooth_image), img)
    tmpl = bench(
        "klt.extract_templates",
        jax.jit(klt.extract_templates), smooth, f1.xy,
    )

    m = bench(
        "match_features",
        jax.jit(lambda d, ma: matching.match_features(
            d, ma, d, ma, max_distance=p.max_match_distance)),
        f1.desc, f1.mask,
    )
    kr = bench(
        "klt_track",
        jax.jit(klt.klt_track), tmpl, smooth, f1.xy, m.mask,
    )

    key = jax.random.PRNGKey(0)
    rays = jnp.concatenate([f1.xy, jnp.ones((K, 1))], -1)
    rr = bench(
        "essential_ransac",
        jax.jit(lambda r1, r2, ma, k: ransac.essential_ransac(
            r1, r2, ma, k, num_hypotheses=p.ransac_hypotheses,
            threshold_sq=1e-6)),
        rays, rays, m.mask, key,
    )
    tri = bench(
        "sfm_triangulate",
        jax.jit(lambda r1, r2, ma: sfm.sfm_triangulate(
            r1, r2, ma, SE3(jnp.eye(3), jnp.asarray([1.0, 0, 0])))),
        rays, rays, m.mask,
    )

    # BA with the tracking-step shape: 2 poses, 512 points
    cap = p.ba_old + p.ba_new
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (cap, 3)) + [0, 0, 5], jnp.float32)
    poses = SE3(
        jnp.stack([jnp.eye(3, dtype=jnp.float32)] * 2),
        jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.float32),
    )
    Xc = jnp.einsum("fji,fpj->fpi", poses.R, pts[None] - poses.t[:, None])
    obs = Xc[..., :2] / Xc[..., 2:]
    obs_mask = jnp.ones((2, cap), bool)
    prob = ba_mod.BAProblem.create(
        poses0=poses, points0=pts, obs=obs, obs_mask=obs_mask,
        pose_prior=poses,
        pose_prior_info=jnp.stack(
            [1e10 * jnp.eye(6, dtype=jnp.float32),
             jnp.zeros((6, 6), jnp.float32)]),
    )
    for iters in (5, 25):
        bench(
            f"ba_solve(iters={iters})",
            jax.jit(lambda pr: ba_mod.ba_solve(
                pr, ba_mod.BAParams(max_iterations=iters))),
            prob,
        )


if __name__ == "__main__":
    main()
