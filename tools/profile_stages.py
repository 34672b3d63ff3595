"""Per-stage on-chip timing of the fused VO step's components.

Times each pipeline stage (ORB, matching, KLT, E-RANSAC, triangulation,
two-frame BA) as its own jitted function on the real TPU, to locate the
frames/s bottleneck. Diagnostics only — not part of the library surface.

Run:  python tools/profile_stages.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mvslam_tpu  # noqa: F401  (sets matmul precision)
from mvslam_tpu.frontend.vo_jit import VoJitParams, make_vo_step, vo_init_state
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.ops import klt, matching, pnp, ransac, sfm
from mvslam_tpu.ops.camera import PinholeCamera
from mvslam_tpu.ops.features import OrbParams, orb_detect

TSUKUBA = "/root/reference/data/tsukuba"


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:8.3f} ms")
    return out


def main():
    print("devices:", jax.devices())
    p = VoJitParams()
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    img1 = jax.device_put(load_image_grayscale(f"{TSUKUBA}/1.jpg"))
    img2 = jax.device_put(load_image_grayscale(f"{TSUKUBA}/2.jpg"))

    orb_j = jax.jit(lambda im: orb_detect(im, p.orb))
    f1 = timeit("orb_detect", orb_j, img1)
    f2 = timeit("orb_detect(2)", orb_j, img2, iters=5)

    match_j = jax.jit(
        lambda d1, m1, d2, m2: matching.match_features(
            d1, m1, d2, m2, max_distance=p.max_match_distance
        )
    )
    m = timeit("match_features", match_j, f1.desc, f1.mask, f2.desc, f2.mask)

    smooth_j = jax.jit(klt.smooth_image)
    sm2 = timeit("smooth_image", smooth_j, img2)
    tmpl_j = jax.jit(klt.extract_templates)
    t1 = timeit("extract_templates", tmpl_j, smooth_j(img1), f1.xy)
    kltj = jax.jit(klt.klt_track)
    kr = timeit("klt_track", kltj, t1, sm2, f2.xy[m.idx], m.mask)

    ones = jnp.ones_like(f1.xy[..., :1])
    rays1 = jnp.concatenate([f1.xy, ones], -1) @ K_inv.T
    rays2 = jnp.concatenate([kr.xy, ones], -1) @ K_inv.T

    thr = p.max_error_sq / (350.0 * 350.0)
    er_j = jax.jit(
        lambda r1, r2, mk, key: ransac.essential_ransac(
            r1, r2, mk, key, num_hypotheses=p.ransac_hypotheses,
            threshold_sq=thr,
        )
    )
    rr = timeit("essential_ransac", er_j, rays1, rays2, m.mask,
                jax.random.PRNGKey(0))

    rec_j = jax.jit(sfm.recover_pose_and_points)
    pose, pts, pmask = timeit("recover_pose_and_points", rec_j, rr.model,
                              rays1, rays2, rr.inlier_mask)

    ref_j = jax.jit(
        lambda r1, r2, mk, T, X: sfm.sfm_refine(
            r1, r2, mk, T, X,
            ba_params=ba_mod.BAParams(max_iterations=p.ba_iterations),
        )
    )
    timeit("sfm_refine (2-frame BA)", ref_j, rays1, rays2, pmask, pose, pts)

    # the full fused step, all three modes exercised
    step = make_vo_step(p)
    state = vo_init_state(p)
    state, _ = step(state, img1, K_inv, focal)
    state, _ = step(state, img2, K_inv, focal)
    jax.block_until_ready(state)
    st0 = state
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        state, out = step(st0, img2, K_inv, focal)
    jax.block_until_ready(state)
    print(f"{'full fused step (tracking)':32s} "
          f"{(time.perf_counter() - t0) / N * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
